"""Derived KPI views over the committed snapshot.

Capability parity with the reference's materialized views
(/root/reference/etl/clickhouse_schema/kpi_views.sql): grouped distinct
counts, sums, ratios with null-guards, and two-level rollups — re-expressed
as Ray Data grouped aggregates over the tokenized-sequence table. The
reference recomputes views each sync cycle (/root/reference/etl/main.py:97-98);
here views are cheap Dataset jobs over the clean snapshot (MERGE already
applied at write, so no COUNT-DISTINCT is needed to mask duplicates — see
SURVEY.md §2.6 on why DISTINCT was load-bearing there).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from .apply import read_snapshot


def source_stats(snapshot: ray.data.Dataset) -> ray.data.Dataset:
    """Per-source rollup (analog of mv_advertiser_performance,
    kpi_views.sql:103-128): doc count, token sum, tokens/doc."""
    return snapshot.groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tok", alias_name="sum_tok"),
        Mean("n_tok", alias_name="avg_tok"),
        Min("n_tok", alias_name="min_tok"),
        Max("n_tok", alias_name="max_tok"),
    )


def totals(snapshot: ray.data.Dataset) -> dict:
    """Global corpus totals (analog of the seeder stats report,
    /root/reference/seeder/main.py:71-93)."""
    agg = snapshot.aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tok", alias_name="sum_tok"),
        Max("lsn", alias_name="max_lsn"),
    )
    return dict(agg)


def top_sources(snapshot: ray.data.Dataset, k: int = 3) -> pa.Table:
    """Top-k sources by token volume (sort + limit demo, SURVEY.md §2.8)."""
    stats = source_stats(snapshot)
    return pa.Table.from_pandas(
        stats.sort("sum_tok", descending=True).limit(k).to_pandas(),
        preserve_index=False,
    )


def kpi_report(table_dir: str, epoch: int | None = None) -> dict:
    """One-call report over a committed table (CLI `kpi` subcommand);
    ``epoch`` time-travels to a retained historical commit."""
    snap = read_snapshot(table_dir, epoch=epoch)
    per_source = source_stats(snap).to_pandas().sort_values("source")
    return {
        "totals": totals(snap),
        "per_source": per_source.to_dict(orient="records"),
    }
