"""Token-budget mixture sampling vs an independent DuckDB window-cumsum
oracle: the kept set must equal the greedy (LehmerHash, doc_id)-order prefix
whose running token total stays within each source's budget."""

from __future__ import annotations

import duckdb
import pytest

from clickhouse_data_pipeline_ray.functions.mixing import token_budget_sample

SF_DIR = "/root/testdata/sf0.001"
DOCS = f"{SF_DIR}/documents.parquet"


def _read(ray, num_blocks=None):
    return ray.data.read_parquet(
        DOCS,
        columns=["doc_id", "source", "n_chars"],
        override_num_blocks=num_blocks,
    )


def _oracle(budgets: dict[str, int]) -> set[int]:
    cases = " ".join(
        f"WHEN '{s}' THEN {b}" for s, b in budgets.items()
    )
    return set(
        duckdb.sql(
            f"""
            WITH h AS (
              SELECT doc_id, source, n_chars,
                     (doc_id * 48271) % 2147483647 AS hh
              FROM read_parquet('{DOCS}')
            ),
            c AS (
              SELECT doc_id, source,
                     sum(n_chars) OVER (
                       PARTITION BY source ORDER BY hh, doc_id
                       ROWS UNBOUNDED PRECEDING
                     ) AS cum
              FROM h
            )
            SELECT doc_id FROM c
            WHERE cum <= CASE source {cases} ELSE NULL END
               OR source NOT IN ({', '.join(repr(s) for s in budgets)})
            """
        ).df()["doc_id"]
    )


BUDGET_CASES = [
    {"src0": 5000, "src1": 2000},                 # partial budgets, others whole
    {"src0": 0, "src2": 10_000_000},              # zero budget + budget > total
    {"src0": 137, "src1": 1, "src2": 9999, "src3": 50_000, "src4": 4242},
]


@pytest.mark.parametrize("budgets", BUDGET_CASES)
def test_budget_sample_matches_window_cumsum_oracle(ray_session, budgets):
    got = token_budget_sample(
        _read(ray_session), budgets, tok_col="n_chars"
    ).to_pandas()
    assert set(got["doc_id"]) == _oracle(budgets)
    # kept totals never exceed the budget for budgeted sources
    per_src = got.groupby("source")["n_chars"].sum()
    for s, b in budgets.items():
        assert per_src.get(s, 0) <= b


def test_budget_sample_partitioning_invariant(ray_session):
    budgets = {"src0": 3000, "src3": 1234}
    a = token_budget_sample(_read(ray_session, 1), budgets, tok_col="n_chars")
    b = token_budget_sample(_read(ray_session, 8), budgets, tok_col="n_chars")
    assert set(a.to_pandas()["doc_id"]) == set(b.to_pandas()["doc_id"])


def test_budget_sample_bucket_count_invariant(ray_session):
    budgets = {"src1": 4321, "src4": 777}
    a = token_budget_sample(
        _read(ray_session), budgets, tok_col="n_chars", n_buckets=16
    )
    b = token_budget_sample(
        _read(ray_session), budgets, tok_col="n_chars", n_buckets=4096
    )
    assert set(a.to_pandas()["doc_id"]) == set(b.to_pandas()["doc_id"])


def test_budget_sample_empty_budgets_is_identity(ray_session):
    ds = _read(ray_session)
    out = token_budget_sample(ds, {}, tok_col="n_chars")
    assert out is ds


def test_budget_sample_string_keys(ray_session):
    # the engine's snapshot tables key docs by STRING doc_id — the sampler
    # must handle them (stable hash_array order instead of the Lehmer int
    # permutation); oracle = the same greedy prefix computed independently
    # in pandas over the full (hash, doc_id) sort
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from pandas.util import hash_array

    from clickhouse_data_pipeline_ray.functions.mixing import LEHMER_M

    rng = np.random.default_rng(7)
    n = 1000
    df = pd.DataFrame(
        {
            "doc_id": [f"doc-{i:05d}" for i in range(n)],
            "source": rng.choice(["a", "b", "c"], n),
            "n_tok": rng.integers(1, 400, n),
        }
    )
    budgets = {"a": 9000, "b": 1500}
    ds = ray_session.data.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    got = set(token_budget_sample(ds, budgets).to_pandas()["doc_id"])

    ref = df.copy()
    ref["h"] = (
        hash_array(ref["doc_id"].to_numpy(object)) % np.uint64(LEHMER_M)
    ).astype(np.int64)
    ref = ref.sort_values(["source", "h", "doc_id"], kind="mergesort")
    ref["cum"] = ref.groupby("source")["n_tok"].cumsum()
    want = set(
        ref[
            ref.apply(
                lambda r: r["source"] not in budgets
                or r["cum"] <= budgets[r["source"]],
                axis=1,
            )
        ]["doc_id"]
    )
    assert got == want
    per = token_budget_sample(ds, budgets).to_pandas().groupby("source")["n_tok"].sum()
    for s, b in budgets.items():
        assert per.get(s, 0) <= b


def test_budget_sample_greedy_maximality(ray_session):
    # the kept prefix is maximal: the FIRST excluded doc (in hash order) of a
    # budgeted source would push the running total past the budget
    budgets = {"src2": 6000}
    got = token_budget_sample(
        _read(ray_session), budgets, tok_col="n_chars"
    ).to_pandas()
    all_docs = duckdb.sql(
        f"""
        SELECT doc_id, n_chars,
               (doc_id * 48271) % 2147483647 AS hh
        FROM read_parquet('{DOCS}') WHERE source = 'src2'
        ORDER BY hh, doc_id
        """
    ).df()
    kept = set(got[got["source"] == "src2"]["doc_id"])
    total = 0
    for _, row in all_docs.iterrows():
        if row["doc_id"] in kept:
            total += row["n_chars"]
        else:
            assert total + row["n_chars"] > budgets["src2"]
            break
