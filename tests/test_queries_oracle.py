"""Mini-driver: run every queries() entry at sf0.001 and compare the
SQL-checkable ones against oracle_sql() via DuckDB — row count, column names,
and order-insensitive values — mirroring the grading driver's comparison."""

import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return pd.DataFrame(obj)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _oracle_pairs():
    from clickhouse_data_pipeline_ray.pipelines.queries import (
        ALL_QUERIES,
        EXTRA_ORACLE_SQL,
        QUERIES,
        build_oracle_sql,
    )

    oracle = build_oracle_sql(SF_DIR)
    assert set(oracle) <= set(QUERIES)
    # retired-from-driver extras keep full oracle coverage in pytest
    assert set(EXTRA_ORACLE_SQL) <= set(ALL_QUERIES)
    return sorted(set(oracle) | set(EXTRA_ORACLE_SQL))


@pytest.mark.parametrize("name", _oracle_pairs())
def test_query_matches_oracle(ray_session, con, name):
    from clickhouse_data_pipeline_ray.pipelines.queries import (
        ALL_QUERIES,
        EXTRA_ORACLE_SQL,
        build_oracle_sql,
    )

    got = _canon(_to_pandas(ALL_QUERIES[name](SF_DIR)))
    sql = {**build_oracle_sql(SF_DIR), **EXTRA_ORACLE_SQL}[name]
    want = _canon(con.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    except AssertionError as e:
        raise AssertionError(f"{name}: value mismatch\n{e}") from e


def test_rows_only_queries_run(ray_session):
    """Non-SQL entries must at least run and return a stable shape."""
    from clickhouse_data_pipeline_ray.pipelines.queries import QUERIES, build_oracle_sql

    oracle = build_oracle_sql(SF_DIR)
    for name, fn in QUERIES.items():
        if name in oracle or name.startswith("cdc_"):
            continue
        df = _to_pandas(fn(SF_DIR))
        assert df is not None, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    result = e.entry()
    df = _to_pandas(result)
    assert len(df) > 0
    assert "doc_id" in df.columns
    assert set(e.oracle_sql()) <= set(e.queries())


def test_term_vocab_distributed_path_identical(ray_session, con, monkeypatch):
    """Forcing term_doc_frequency's high-cardinality combine (limit=0) must
    take the distributed groupby path and still match the SQL oracle."""
    from clickhouse_data_pipeline_ray.pipelines import queries as Q

    monkeypatch.setattr(Q, "TERM_DRIVER_LIMIT", 0)
    got = _canon(_to_pandas(Q.QUERIES["term_doc_frequency"](SF_DIR)))
    want = _canon(con.execute(Q.build_oracle_sql(SF_DIR)["term_doc_frequency"]).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bucket_count_invariance(ray_session, con, monkeypatch):
    """Hash-bucketed reduce stages must give identical results at any bucket
    count (pure hash partitioning): run lww/sessionize/lag at n_buckets=3 and
    compare against the DuckDB oracle again."""
    from clickhouse_data_pipeline_ray.pipelines import queries as Q

    monkeypatch.setattr(Q, "_n_reduce_buckets", lambda: 3)
    oracle = Q.build_oracle_sql(SF_DIR)
    for name in ("lww_latest_event_per_user", "sessionize_events", "prev_event_gap"):
        got = _canon(_to_pandas(Q.QUERIES[name](SF_DIR)))
        want = _canon(con.execute(oracle[name]).df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_verify_queries_surface(ray_session):
    """The in-repo correctness gate (CLI `verify-queries`): a fast subset
    must match, and an unknown name must be reported, not crash."""
    from clickhouse_data_pipeline_ray.pipelines.queries import verify_queries

    res = verify_queries(SF_DIR, ["ctr_daily", "orders_by_nation", "nope"])
    assert res["ctr_daily"]["match"] and res["orders_by_nation"]["match"]
    assert res["nope"]["err"] == "unknown query"
