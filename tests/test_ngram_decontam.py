"""N-gram-hash decontamination: hand-computed expectations, the
short-snippet rejection contract, and a DuckDB oracle that rebuilds the
k-gram overlap from STRINGS (lead-chain window) — fully independent of the
engine's rolling-hash kernel."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from clickhouse_data_pipeline_ray.functions.textstats import (
    NgramDecontaminate,
    ngram_decontaminate,
    snippet_shingle_hashes,
)


def _tbl(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_ngram_decontaminate_hand_computed():
    snippets = ["a b c d e"]  # k=3 grams: {a b c, b c d, c d e}
    bench = snippet_shingle_hashes(snippets, k=3)
    assert len(bench) == 3
    stage = NgramDecontaminate(bench_hashes=bench, k=3)
    out = stage(
        _tbl(
            [
                "x a b c d y",  # grams: {x a b, a b c, b c d, c d y} → 2 hits
                "a b c a b c",  # distinct grams {a b c, b c a, c a b} → 1 hit
                "q r s t",  # no overlap
                "a b",  # short doc: word-hash fallback, can never hit
                "",  # empty doc: zero shingles
            ]
        )
    )
    assert out.column("n_shingles").to_pylist() == [4, 3, 2, 2, 0]
    assert out.column("n_contaminated").to_pylist() == [2, 1, 0, 0, 0]
    fr = out.column("contam_frac").to_pylist()
    assert fr[0] == pytest.approx(0.5)
    assert fr[1] == pytest.approx(1 / 3)
    assert fr[2:] == [0.0, 0.0, 0.0]


def test_short_snippet_rejected_loudly():
    with pytest.raises(ValueError, match="fewer than k"):
        snippet_shingle_hashes(["one two"], k=8)
    # None snippets are dropped, not crashed on
    assert len(snippet_shingle_hashes([None, "a b c"], k=3)) == 1


def test_repeated_snippet_occurrence_counts_once():
    """DISTINCT semantics: a snippet appearing twice in one doc counts its
    grams once (the denominator is distinct too)."""
    bench = snippet_shingle_hashes(["p q r"], k=3)
    stage = NgramDecontaminate(bench_hashes=bench, k=3)
    out = stage(_tbl(["p q r x p q r"]))
    # distinct grams: {p q r, q r x, r x p, x p q} → 4, one contaminated
    assert out.column("n_shingles").to_pylist() == [4]
    assert out.column("n_contaminated").to_pylist() == [1]


K = 4
_GRAMS_SQL = """
    WITH w AS (SELECT {key} AS id, string_split(text, ' ') AS ws FROM {tab}),
    i AS (SELECT id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w FROM w),
    g0 AS (SELECT id,
                  w || ' ' || lead(w, 1) OVER win || ' ' ||
                  lead(w, 2) OVER win || ' ' || lead(w, 3) OVER win AS g,
                  lead(w, 3) OVER win AS tail
           FROM i WINDOW win AS (PARTITION BY id ORDER BY i))
    SELECT DISTINCT id, g FROM g0 WHERE tail IS NOT NULL
"""


def _oracle(docs: pd.DataFrame, snips: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("docs", docs)
    con.register("snips", snips)
    q = f"""
        WITH dg AS ({_GRAMS_SQL.format(key="doc_id", tab="docs")}),
        sg AS ({_GRAMS_SQL.format(key="snip_id", tab="snips")}),
        tot AS (SELECT id, CAST(count(*) AS BIGINT) AS n_shingles
                FROM dg GROUP BY id),
        hits AS (SELECT id, CAST(count(*) AS BIGINT) AS n_contaminated
                 FROM dg WHERE g IN (SELECT g FROM sg) GROUP BY id)
        SELECT tot.id AS doc_id, tot.n_shingles,
               coalesce(hits.n_contaminated, 0) AS n_contaminated
        FROM tot LEFT JOIN hits USING (id) ORDER BY doc_id
    """
    out = con.execute(q).df()
    con.close()
    return out


def _corpus():
    rng = np.random.default_rng(42)
    vocab = np.array([f"w{i:03d}" for i in range(200)])
    docs = [" ".join(rng.choice(vocab, rng.integers(6, 30))) for _ in range(60)]
    # snippet 0: verbatim 8-word span of doc 5; also planted into doc 20
    span = " ".join(docs[5].split()[1:9])
    docs[20] = docs[20] + " " + span + " " + docs[20]
    # snippet 1: random words — no planted overlap
    rand_snip = " ".join(rng.choice(vocab, 8))
    # snippet 2: span of doc 10 with the last word changed (partial overlap)
    s10 = docs[10].split()[:8]
    part_snip = " ".join(s10[:-1] + ["zzz"])
    return docs, [span, rand_snip, part_snip]


def test_duckdb_oracle_agreement():
    docs, snippets = _corpus()
    bench = snippet_shingle_hashes(snippets, k=K)
    stage = NgramDecontaminate(bench_hashes=bench, k=K)
    got = stage(_tbl(docs)).to_pandas().sort_values("doc_id")

    exp = _oracle(
        pd.DataFrame({"doc_id": range(len(docs)), "text": docs}),
        pd.DataFrame({"snip_id": range(len(snippets)), "text": snippets}),
    )
    # the oracle only emits docs with >= K words; all generated docs qualify
    assert len(exp) == len(docs)
    assert got["n_shingles"].tolist() == exp["n_shingles"].tolist()
    assert got["n_contaminated"].tolist() == exp["n_contaminated"].tolist()
    # the plants actually exercised the operator
    by_id = got.set_index("doc_id")["n_contaminated"]
    assert by_id[5] >= 5 and by_id[20] >= 5  # 8-word span → 5 four-grams
    assert by_id[10] >= 1  # partial-overlap snippet still caught
    assert (got["n_contaminated"] > 0).sum() >= 3


def test_dataset_pipeline_hits_and_all(ray_session):
    import ray.data as rd

    docs, snippets = _corpus()
    ds = rd.from_arrow(_tbl(docs)).repartition(5)

    hits = ngram_decontaminate(ds, snippets, k=K, concurrency=2).to_pandas()
    alls = ngram_decontaminate(
        ds, snippets, k=K, concurrency=2, emit="all"
    ).to_pandas()

    assert len(alls) == len(docs)
    expected_hits = alls[alls["n_contaminated"] >= 1]
    assert sorted(hits["doc_id"]) == sorted(expected_hits["doc_id"])
    assert {5, 10, 20} <= set(hits["doc_id"])

    # threshold knobs respected
    strict = ngram_decontaminate(
        ds, snippets, k=K, concurrency=2, min_hits=5
    ).to_pandas()
    assert set(strict["doc_id"]) == set(
        alls[alls["n_contaminated"] >= 5]["doc_id"]
    )
    with pytest.raises(ValueError, match="emit"):
        ngram_decontaminate(ds, snippets, k=K, emit="bogus")


def test_empty_snippet_set_rejected():
    """An accidentally empty/all-null benchmark source must fail loudly,
    never report a trivially-clean corpus (review finding)."""
    with pytest.raises(ValueError, match="no snippets"):
        snippet_shingle_hashes([], k=4)
    with pytest.raises(ValueError, match="no snippets"):
        snippet_shingle_hashes([None, None], k=4)


def test_cli_zero_hits_reports_cleanly(ray_session, tmp_path, capsys):
    """The decontaminate CLI with --output and ZERO flagged docs must print
    the summary, not crash on an empty write-back (review finding)."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from clickhouse_data_pipeline_ray.cli import main

    docs = tmp_path / "sf"
    docs.mkdir()
    pq.write_table(
        pa.table({"doc_id": [1, 2], "text": ["aa bb cc dd ee", "ff gg hh ii jj"]}),
        str(docs / "documents.parquet"),
    )
    snips = tmp_path / "snips.parquet"
    pq.write_table(pa.table({"text": ["zz yy xx ww vv uu tt ss"]}), str(snips))
    out = tmp_path / "hits"
    rc = main([
        "decontaminate", "--sf-dir", str(docs), "--snippets", str(snips),
        "--k", "4", "--output", str(out),
    ])
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out.splitlines()[0])
    assert summary["flagged_docs"] == 0
    got = pq.read_table(str(out / "part-00000.parquet"))
    assert got.num_rows == 0
