"""Lexical retrieval: BM25 top-k over a document corpus.

Completes the engine's similarity-search family: `functions/similarity.py`
covers the dense/embedding side (brute-force + IVF ANN); this module covers
the sparse/lexical side a training-data curation stack needs — query-based
corpus inspection, contamination triage ("which docs mention this eval
phrase?"), and boolean-ish filtering with ranked output. The reference
pipeline has no search surface at all (its analytics stop at the KPI views,
/root/reference/etl/clickhouse_schema/kpi_views.sql); this is a beyond-
reference operator in the same class as the ANN queries.

Formula: Okapi BM25 (Robertson–Spärck Jones, public knowledge) with the
standard +1 idf smoothing so idf is always positive:

    idf(t)      = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)
    score(d, q) = Σ_{t ∈ q} idf(t) · tf_{t,d}·(k1+1)
                  / (tf_{t,d} + k1·(1 - b + b·|d|/avgdl))

Scale design (100 TB corpus, small query):

- **Phase 1 (corpus stats)** is a map-only pass that reduces each block to a
  SINGLE partial row (n_docs, Σ|d|, and a df vector aligned to the sorted
  query terms) — O(blocks) driver state, no shuffle. Only the |q| query
  terms are counted; the corpus vocabulary never materializes anywhere.
- **Phase 2 (scoring)** broadcasts the tiny (terms, idf, avgdl) model once
  per actor (``fn_constructor_kwargs``) and scores each block vectorized:
  one Arrow split kernel, one searchsorted against the sorted query terms,
  one bincount for the (doc × term) tf matrix — no Python loop over rows or
  terms. Each block emits only its local top-k (docs matching ≥1 term), so
  the driver merge sees O(blocks × k) rows. No shuffle in either phase.
- Tokenization matches ``term_doc_frequency``/the SQL twin exactly: split on
  a single space, no lowercasing, no stemming — so the pytest DuckDB oracle
  (string_split + unnest) reproduces tf/df/|d| bit-for-bit and scores agree
  to float tolerance.

Determinism: results are block-partitioning-invariant (tf/df/avgdl are
global sums; ties break by doc_id ascending) — pinned by the block-count
invariance test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def _terms_of(query: str | list[str]) -> np.ndarray:
    """Sorted unique query terms (BM25 scores each distinct term once;
    duplicates in the query string carry no extra weight by convention)."""
    terms = query.split(" ") if isinstance(query, str) else list(query)
    uniq = sorted({t for t in terms if t})
    if not uniq:
        raise ValueError("BM25 query has no non-empty terms")
    return np.array(uniq, dtype=object)


def _split_docs(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc word-lengths, flattened words, row index per word) — one Arrow
    split kernel + one repeat; the shared tokenization of the module."""
    lists = pc.split_pattern(batch.column("text"), pattern=" ").combine_chunks()
    lens = pc.list_value_length(lists).cast(pa.int64()).to_numpy(zero_copy_only=False)
    words = pc.list_flatten(lists).to_numpy(zero_copy_only=False).astype(object)
    rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return lens, words, rows


def _match_terms(words: np.ndarray, qarr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(hit mask over words, query-term index per word) via searchsorted
    against the sorted query terms — O(W log |q|), no per-term pass."""
    idx = np.searchsorted(qarr, words)
    idx = np.clip(idx, 0, len(qarr) - 1)
    hit = qarr[idx] == words
    return hit, idx


def corpus_stats(
    ds: ray.data.Dataset, query: str | list[str]
) -> tuple[np.ndarray, np.ndarray, int, float]:
    """Phase 1: (sorted terms, df per term, N, avgdl) for the query terms
    only. One map-only pass; each block contributes ONE partial row."""
    qarr = _terms_of(query)
    nq = len(qarr)

    def partial(b: pa.Table) -> pa.Table:
        lens, words, rows = _split_docs(b)
        hit, idx = _match_terms(words, qarr)
        # df: distinct (row, term) pairs per term
        pair = np.unique(rows[hit] * nq + idx[hit])
        df = np.bincount((pair % nq).astype(np.int64), minlength=nq)
        return pa.table(
            {
                "n_docs": pa.array([len(lens)], pa.int64()),
                "sum_len": pa.array([int(lens.sum())], pa.int64()),
                "df": pa.array([df.tolist()], pa.list_(pa.int64())),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n_docs = int(parts["n_docs"].sum())
    if n_docs == 0:
        return qarr, np.zeros(nq, np.int64), 0, 0.0
    avgdl = float(parts["sum_len"].sum()) / n_docs
    df = np.sum(np.stack(parts["df"].to_numpy()), axis=0).astype(np.int64)
    return qarr, df, n_docs, avgdl


class BM25Scorer:
    """Actor-pool scoring stage: the (terms, idf, avgdl) model is built once
    per actor in ``__init__``; ``__call__`` scores one block vectorized and
    emits only the block-local top-k (docs matching ≥1 query term)."""

    def __init__(
        self,
        terms: list[str],
        idf: list[float],
        avgdl: float,
        k: int,
        k1: float = DEFAULT_K1,
        b: float = DEFAULT_B,
    ) -> None:
        self.qarr = np.array(terms, dtype=object)
        self.idf = np.asarray(idf, dtype=np.float64)
        self.avgdl = float(avgdl)
        self.k = int(k)
        self.k1 = float(k1)
        self.b = float(b)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lens, words, rows = _split_docs(batch)
        nq = len(self.qarr)
        hit, idx = _match_terms(words, self.qarr)
        flat = rows[hit] * nq + idx[hit]
        tf = (
            np.bincount(flat, minlength=len(lens) * nq)
            .reshape(len(lens), nq)
            .astype(np.float64)
        )
        dl = lens.astype(np.float64)
        denom = tf + self.k1 * (1.0 - self.b + self.b * (dl[:, None] / self.avgdl))
        score = (self.idf[None, :] * tf * (self.k1 + 1.0) / denom).sum(axis=1)
        matched = score > 0.0
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)[matched]
        score = score[matched]
        order = np.lexsort((doc_id, -score))[: self.k]
        return pa.table(
            {
                "doc_id": pa.array(doc_id[order]),
                "score": pa.array(score[order], pa.float64()),
            }
        )


def bm25_topk(
    ds: ray.data.Dataset,
    query: str | list[str],
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    concurrency: int = 2,
) -> pa.Table:
    """BM25 top-k over a Dataset with (doc_id, text) columns. Returns
    (rank, doc_id, score) sorted by score DESC, doc_id ASC; docs matching no
    query term are excluded (their score is exactly 0)."""
    empty = pa.table(
        {
            "rank": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )
    qarr, df, n_docs, avgdl = corpus_stats(ds, query)
    if n_docs == 0 or not df.any():
        # empty corpus, or no query term occurs anywhere: every score is
        # exactly 0 and the scoring pass would stream the corpus for nothing
        return empty
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    parts = ds.map_batches(
        BM25Scorer,
        fn_constructor_kwargs={
            "terms": qarr.tolist(),
            "idf": idf.tolist(),
            "avgdl": avgdl,
            "k": k,
            "k1": k1,
            "b": b,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=0.5,
    ).to_pandas()
    if parts.empty:
        return empty
    out = parts.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    out = out.assign(rank=np.arange(1, len(out) + 1, dtype=np.int64))
    return pa.Table.from_pandas(
        out[["rank", "doc_id", "score"]].reset_index(drop=True),
        preserve_index=False,
    )
