"""Deterministic shuffled export (training shards): exact-once coverage,
seed determinism, partitioning independence, shard-local order, SQL-shared
hash, and string keys."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from clickhouse_data_pipeline_ray.pipelines.export import (
    LEHMER_A,
    LEHMER_M,
    export_shuffled,
    read_shard,
)

N = 500


def _ds(ids=None):
    ids = list(range(N)) if ids is None else ids
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "n_tok": pa.array([i * 3 for i in range(len(ids))])})
    )


def _all_shards(out, nsh):
    frames = []
    for s in range(nsh):
        t = read_shard(out, s)
        if t is not None:
            df = t.to_pandas()
            df["shard"] = s  # partition value lives in the path
            df["order"] = range(len(df))
            frames.append(df)
    return pd.concat(frames, ignore_index=True)


def test_exact_once_coverage_and_balance(ray_session, tmp_path):
    out = str(tmp_path / "sh")
    export_shuffled(_ds(), out, num_shards=8, seed=7)
    got = _all_shards(out, 8)
    assert sorted(got["doc_id"]) == list(range(N))  # every row exactly once
    sizes = got.groupby("shard").size()
    assert len(sizes) == 8 and sizes.min() > N / 8 * 0.5  # no starved shard


def test_seed_determinism_and_difference(ray_session, tmp_path):
    a, b, c = (str(tmp_path / x) for x in "abc")
    export_shuffled(_ds(), a, num_shards=8, seed=7)
    export_shuffled(_ds(), b, num_shards=8, seed=7)
    export_shuffled(_ds(), c, num_shards=8, seed=8)
    fa, fb, fc = (_all_shards(x, 8) for x in (a, b, c))
    pd.testing.assert_frame_equal(fa, fb)
    assert not fa["doc_id"].equals(fc["doc_id"])  # a new seed reshuffles


def test_partitioning_independence(ray_session, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    export_shuffled(_ds(), a, num_shards=8, seed=3)
    export_shuffled(_ds().repartition(13), b, num_shards=8, seed=3)
    pd.testing.assert_frame_equal(_all_shards(a, 8), _all_shards(b, 8))


def test_assignment_matches_sql_oracle(ray_session, tmp_path):
    """(shard, within-shard order) must equal DuckDB's replay of the shared
    Lehmer hash — the same engine/SQL convention sample_documents uses."""
    out = str(tmp_path / "sh")
    export_shuffled(_ds(), out, num_shards=8, seed=7)
    got = _all_shards(out, 8)[["doc_id", "shard", "order"]]
    want = duckdb.connect().execute(f"""
        WITH h AS (
          SELECT r.range AS doc_id,
                 ((r.range + 7) * {LEHMER_A}) % {LEHMER_M} AS pos
          FROM range({N}) r
        )
        SELECT doc_id, CAST(pos % 8 AS INT) AS shard,
               CAST(row_number() OVER (PARTITION BY pos % 8
                                       ORDER BY pos, doc_id) - 1 AS BIGINT)
                   AS ord
        FROM h
    """).df()
    m = got.merge(want, on="doc_id")
    assert (m["shard_x"] == m["shard_y"]).all()
    assert (m["order"] == m["ord"]).all()


def test_string_keys(ray_session, tmp_path):
    out = str(tmp_path / "sh")
    ids = [f"doc-{i:04d}" for i in range(N)]
    export_shuffled(_ds(ids), out, num_shards=4, seed=1)
    got = _all_shards(out, 4)
    assert sorted(got["doc_id"]) == sorted(ids)


def test_rerun_overwrites_atomically(ray_session, tmp_path):
    out = str(tmp_path / "sh")
    export_shuffled(_ds(), out, num_shards=4, seed=1)
    export_shuffled(_ds(list(range(100))), out, num_shards=4, seed=1)
    got = _all_shards(out, 4)
    assert sorted(got["doc_id"]) == list(range(100))  # no stale shards
