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
        Max("lsn", alias_name="max_lsn"),
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


def kpi_report(table_dir: str, epoch: int | None = None) -> dict:
    """One-call report over a committed table (CLI `kpi` subcommand);
    ``epoch`` time-travels to a retained historical commit.

    ONE merge-on-read scan: the global totals are the column sums of the
    per-source rollup (plus its max of per-source max_lsn), so the second
    full-snapshot aggregate job the old version ran bought nothing."""
    from .apply import load_manifest

    man = load_manifest(table_dir)
    for c in ("source", "n_tok"):
        if c not in man.schema.names:
            raise ValueError(
                f"kpi needs a tokenized-docs table with a {c!r} column; "
                f"this table's schema is {list(man.schema.names)}"
            )
    # pruned read: the rollup touches 3 columns of a wide-token table
    snap = read_snapshot(table_dir, epoch=epoch, columns=["source", "n_tok", "lsn"])
    per_source = source_stats(snap).to_pandas()
    if per_source.empty:
        # zero-row table: Ray's grouped aggregate yields a columnless frame
        return {
            "totals": {"n_docs": 0, "sum_tok": 0, "max_lsn": 0},
            "per_source": [],
        }
    per_source = per_source.sort_values("source")
    tot = {
        "n_docs": int(per_source["n_docs"].sum()),
        "sum_tok": int(per_source["sum_tok"].sum()),
        "max_lsn": int(per_source["max_lsn"].max()),
    }
    return {
        "totals": tot,
        "per_source": per_source.drop(columns=["max_lsn"]).to_dict(orient="records"),
    }
