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

import os

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
    split kernel + one repeat; the shared tokenization of the module.
    NULL text is a zero-length doc (fill_null before the cast — a null list
    length is null, not 0, and poisons np.repeat; list_flatten already
    skips null rows so words/rows stay aligned)."""
    lists = pc.split_pattern(batch.column("text"), pattern=" ").combine_chunks()
    lens = pc.fill_null(pc.list_value_length(lists), 0).cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    words = pc.list_flatten(lists).to_numpy(zero_copy_only=False).astype(object)
    rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return lens, words, rows


def _bm25_scores(
    tf: np.ndarray, dl: np.ndarray, idf: np.ndarray, avgdl: float, k1: float, b: float
) -> np.ndarray:
    """THE scoring kernel — every path (streaming scorer, text index, table
    token index) calls this one function, which is what makes their results
    bitwise-identical: same float64 ops in the same order, never three
    hand-synchronized copies."""
    denom = tf + k1 * (1.0 - b + b * (dl[:, None] / avgdl))
    return (idf[None, :] * tf * (k1 + 1.0) / denom).sum(axis=1)


def _rank_topk(doc_ids: np.ndarray, score: np.ndarray, k: int) -> pa.Table:
    """(rank, doc_id, score) for the global top-k with the shared tie-break
    (score DESC, doc_id ASC); zero-score docs (no query term) are excluded."""
    matched = score > 0.0
    d, s = doc_ids[matched], score[matched]
    order = np.lexsort((d, -s))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "doc_id": pa.array(d[order]),
            "score": pa.array(s[order], pa.float64()),
        }
    )


def _postings_dense(
    tbl: pa.Table, qarr: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(unique docs, doc×term tf matrix, dl per doc, df per term) from
    postings rows already filtered to the query terms — shared by both
    persisted-index query paths."""
    nq = len(qarr)
    terms = tbl.column("term").to_numpy(zero_copy_only=False).astype(qarr.dtype)
    tidx = np.searchsorted(qarr, terms)
    df = np.bincount(tidx, minlength=nq).astype(np.int64)
    doc_ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    udocs, dinv = np.unique(doc_ids, return_inverse=True)
    tf = np.zeros((len(udocs), nq), dtype=np.float64)
    tf[dinv, tidx] = tbl.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
    dl = np.zeros(len(udocs), dtype=np.float64)
    dl[dinv] = tbl.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
    return udocs, tf, dl, df


def _empty_result(doc_id_type: pa.DataType = pa.int64()) -> pa.Table:
    return pa.table(
        {
            "rank": pa.array([], pa.int64()),
            "doc_id": pa.array([], doc_id_type),
            "score": pa.array([], pa.float64()),
        }
    )


def _type_from_name(name: str | None) -> pa.DataType:
    """Arrow type from the meta.json doc_id_type string (int64/string cover
    every table this engine writes; unknown names default to int64)."""
    return {"string": pa.string(), "large_string": pa.large_string()}.get(
        name or "int64", pa.int64()
    )


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
        score = _bm25_scores(
            tf, lens.astype(np.float64), self.idf, self.avgdl, self.k1, self.b
        )
        local = _rank_topk(
            batch.column("doc_id").to_numpy(zero_copy_only=False), score, self.k
        )
        return local.drop_columns(["rank"])


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
    try:
        did_type = ds.schema().base_schema.field("doc_id").type
    except Exception:
        did_type = pa.int64()
    empty = _empty_result(did_type)
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


# ---------------------------------------------------------------------------
# Persisted inverted index — the 100-TB path (the lexical analog of
# similarity.build_ivf_index / ivf_index_topk): the corpus is scanned ONCE at
# build time into a term-hash-bucketed postings layout; every subsequent
# query opens ONLY the buckets its terms hash to (file-level pruning), reads
# a few small parquet files driver-side, and scores with the exact same
# dense kernel as the streaming path — bitwise-identical results, zero
# corpus scans per query.
# ---------------------------------------------------------------------------


def _term_buckets(terms: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic term → bucket hash (pandas hash_array — stable across
    processes/partitionings, unlike builtin str hash under PYTHONHASHSEED)."""
    from pandas.util import hash_array

    return (hash_array(terms.astype(object)) % np.uint64(num_buckets)).astype(np.int64)


def build_text_index(
    ds: ray.data.Dataset,
    index_dir: str,
    num_buckets: int = 64,
) -> dict:
    """One-time inverted index over (doc_id, text): postings rows
    (term, doc_id, tf, dl) partitioned by ``bucket = hash(term) % B``, plus
    corpus stats (N, avgdl) in meta.json. Postings extraction is one
    vectorized map pass (split → factorize → unique (row, term) pairs with
    counts), and it is genuinely the ONLY corpus pass: each block also emits
    one stats sentinel row (bucket=STATS_BUCKET) carrying (n_docs, sum_len),
    which the driver sums into meta after the write — no second scan.
    IDEMPOTENT via the tmp-write + atomic-swap protocol the table sink and
    the IVF index use — a rebuild after a partial failure can never leave
    stale or duplicate postings files for ``bm25_index_topk`` to read."""
    import json
    import shutil

    import pyarrow.parquet as pq

    nb = int(num_buckets)

    def postings(b: pa.Table) -> pa.Table:
        lens, words, rows = _split_docs(b)
        doc_ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        did_type = b.schema.field("doc_id").type
        stats = pa.table(
            {
                "bucket": pa.array([STATS_BUCKET], pa.int64()),
                "term": pa.array([""], pa.string()),
                "doc_id": pa.array([None], did_type),
                "tf": pa.array([b.num_rows], pa.int64()),
                "dl": pa.array([int(lens.sum())], pa.int64()),
            }
        )
        if len(words) == 0:
            return stats
        uvals, inv = np.unique(words, return_inverse=True)
        pair = rows * len(uvals) + inv
        upair, tf = np.unique(pair, return_counts=True)
        prow = (upair // len(uvals)).astype(np.int64)
        pterm = (upair % len(uvals)).astype(np.int64)
        terms = uvals[pterm]
        body = pa.table(
            {
                "bucket": pa.array(_term_buckets(terms, nb)),
                "term": pa.array(terms.astype(str)),
                "doc_id": pa.array(doc_ids[prow]),
                "tf": pa.array(tf.astype(np.int64)),
                "dl": pa.array(lens[prow]),
            }
        )
        return pa.concat_tables([body, stats.cast(body.schema)])

    post_dir = os.path.join(index_dir, "postings")
    tmp_dir = post_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    ds.map_batches(postings, batch_format="pyarrow").write_parquet(
        tmp_dir, partition_cols=["bucket"]
    )
    stats_dir = os.path.join(tmp_dir, f"bucket={STATS_BUCKET}")
    n_docs, sum_len, did_type_name = 0, 0, "int64"
    if os.path.isdir(stats_dir):
        srow = pq.read_table(stats_dir)
        n_docs = int(pc.sum(srow.column("tf")).as_py() or 0)
        sum_len = int(pc.sum(srow.column("dl")).as_py() or 0)
        did_type_name = str(srow.schema.field("doc_id").type)
        shutil.rmtree(stats_dir)  # queries never probe the sentinel bucket
    shutil.rmtree(post_dir, ignore_errors=True)
    os.replace(tmp_dir, post_dir)

    avgdl = float(sum_len) / n_docs if n_docs else 0.0
    meta = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "num_buckets": nb,
        "doc_id_type": did_type_name,
    }
    with open(os.path.join(index_dir, "meta.json.tmp"), "w") as f:
        json.dump(meta, f)
    os.replace(
        os.path.join(index_dir, "meta.json.tmp"), os.path.join(index_dir, "meta.json")
    )
    return meta


def bm25_index_topk(
    index_dir: str,
    query: str | list[str],
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> pa.Table:
    """BM25 top-k against a persisted text index: opens ONLY the postings
    buckets the query terms hash to, then scores the (few) candidate docs
    with the same dense tf-matrix kernel as the streaming path — the two are
    bitwise-identical by construction (same float64 ops in the same order),
    pinned by the identity test. This is a LATENCY surface: a handful of
    file reads, no Ray job, no corpus scan (the point-lookup convention,
    pipelines/lookup.py)."""
    import json

    import pyarrow.parquet as pq

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    empty = _empty_result(_type_from_name(meta.get("doc_id_type")))
    qarr = _terms_of(query)
    wanted = sorted(set(_term_buckets(qarr, meta["num_buckets"]).tolist()))
    paths = [
        os.path.join(d, name)
        for bk in wanted
        if os.path.isdir(d := os.path.join(index_dir, "postings", f"bucket={bk}"))
        for name in sorted(os.listdir(d))
        if name.endswith(".parquet")
    ]
    if not paths:
        return empty
    tbl = pa.concat_tables(
        pq.read_table(p, columns=["term", "doc_id", "tf", "dl"]) for p in paths
    )
    tbl = tbl.filter(pc.is_in(tbl.column("term"), value_set=pa.array(qarr.astype(str))))
    if tbl.num_rows == 0:
        return empty
    udocs, tf, dl, df = _postings_dense(tbl, qarr)
    idf = np.log((meta["n_docs"] - df + 0.5) / (df + 0.5) + 1.0)
    score = _bm25_scores(tf, dl, idf, meta["avgdl"], k1, b)
    return _rank_topk(udocs, score, k)


DEFAULT_RRF_K0 = 60  # the standard constant from Cormack et al. (SIGIR'09)


def rrf_fuse(
    ranked_lists: list, k: int = 10, k0: int = DEFAULT_RRF_K0, id_col: str = "doc_id"
) -> pa.Table:
    """Reciprocal-rank fusion of ranked result lists (public knowledge:
    Cormack, Clarke & Buettcher, SIGIR 2009): RRF(d) = Σ_lists 1/(k0 +
    rank_list(d)), summed over the lists that returned d. Rank is each
    list's 1-based ORDER (its own score scale never matters — that is the
    point of RRF; sparse BM25 and dense cosine fuse without calibration).

    Pure driver-side arithmetic over k-sized lists — the component searches
    (each a pruned index read or one streamed scan) dominate; fusion is
    O(Σ|lists|). Ties break by id ascending, like every top-k here."""
    scores: dict = {}
    for lst in ranked_lists:
        if isinstance(lst, pa.Table):
            ids = lst.column(id_col).to_pylist()
        else:  # pandas
            ids = list(lst[id_col])
        for rank, d in enumerate(ids, start=1):
            scores[d] = scores.get(d, 0.0) + 1.0 / (k0 + rank)
    if not scores:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "rrf_score": pa.array([], pa.float64()),
            }
        )
    ids = np.array(sorted(scores), dtype=object)
    vals = np.array([scores[d] for d in ids], dtype=np.float64)
    order = np.lexsort((ids, -vals))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "doc_id": pa.array(ids[order].tolist()),
            "rrf_score": pa.array(vals[order], pa.float64()),
        }
    )


def hybrid_topk(
    ds_docs: ray.data.Dataset,
    emb_table: pa.Table,
    query_text: str,
    query_vec: np.ndarray,
    k: int = 10,
    fetch_k: int = 50,
    k0: int = DEFAULT_RRF_K0,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Hybrid sparse+dense retrieval: BM25 over (doc_id, text) fused with
    cosine top-k over an aligned embedding table via RRF. Each component
    runs its own optimized path (BM25's two shuffle-free passes; the
    broadcast-query matmul — swap in ``ivf_index_topk`` / ``bm25_index_topk``
    for the persisted-index variants, the fusion is identical); ``fetch_k``
    deep component lists keep the fused top-k stable at the boundary."""
    from .similarity import brute_force_topk

    sparse = bm25_topk(ds_docs, query_text, k=fetch_k)
    dense = brute_force_topk(
        emb_table,
        np.asarray(query_vec, dtype=np.float64)[None, :],
        query_ids=[-1],  # synthetic id: never exclude a real doc as "self"
        k=fetch_k,
        key_col=key_col,
        vec_col=vec_col,
        exclude_self=False,
    ).rename(columns={"neighbor_id": "doc_id"})
    return rrf_fuse([sparse, dense], k=k, k0=k0)


# ---------------------------------------------------------------------------
# Incremental token index over a COMMITTED table — derived-artifact
# maintenance wired into the CDC engine's lineage: the postings layout is
# partitioned by (term bucket, table partition), so a refresh after new
# apply epochs re-derives ONLY the table partitions whose file chains
# changed (the changed_partitions contract the epoch-diff pipeline uses) —
# O(changed partitions) maintenance, not O(table). Terms are the table's
# token IDS (the tokenized-sequence domain of the north-star schema), not
# words; everything else (postings shape, BM25 kernel) is shared with the
# text index above.
# ---------------------------------------------------------------------------

STATS_BUCKET = -1  # sentinel partition carrying per-pid (n_docs, sum_len)


def _token_buckets(terms: np.ndarray, num_buckets: int) -> np.ndarray:
    from pandas.util import hash_array

    return (hash_array(terms.astype(np.int64)) % np.uint64(num_buckets)).astype(
        np.int64
    )


def _pid_postings(t: pa.Table, pid: int, num_buckets: int, tokens_col: str) -> pa.Table:
    """Postings rows (bucket, term, doc_id, tf, dl, pid) for one partition's
    merged snapshot, plus ONE stats row (bucket=STATS_BUCKET, tf=n_docs,
    dl=sum_len) so refresh can update corpus stats without a second pass.
    Same vectorized shape as the text extraction (flatten → unique pairs)."""
    lists = t.column(tokens_col).combine_chunks()
    lens = pc.fill_null(pc.list_value_length(lists), 0).cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    did_type = t.schema.field("doc_id").type
    stats = pa.table(
        {
            "bucket": pa.array([STATS_BUCKET], pa.int64()),
            "term": pa.array([-1], pa.int64()),
            "doc_id": pa.array([None], did_type),
            "tf": pa.array([t.num_rows], pa.int64()),
            "dl": pa.array([int(lens.sum())], pa.int64()),
            "pid": pa.array([pid], pa.int64()),
        }
    )
    if len(flat) == 0:
        return stats
    uvals, inv = np.unique(flat, return_inverse=True)
    pair = rows * len(uvals) + inv
    upair, tf = np.unique(pair, return_counts=True)
    prow = (upair // len(uvals)).astype(np.int64)
    terms = uvals[(upair % len(uvals)).astype(np.int64)]
    body = pa.table(
        {
            "bucket": pa.array(_token_buckets(terms, num_buckets)),
            "term": pa.array(terms, pa.int64()),
            "doc_id": pa.array(doc_ids[prow]),
            "tf": pa.array(tf.astype(np.int64)),
            "dl": pa.array(lens[prow]),
            "pid": pa.array(np.full(len(terms), pid, np.int64)),
        }
    )
    return pa.concat_tables([body, stats.cast(body.schema)])


def refresh_table_token_index(
    table_dir: str,
    index_dir: str,
    num_buckets: int = 64,
    tokens_col: str = "tokens",
) -> dict:
    """Build — or incrementally refresh — a token-postings BM25 index over a
    committed table's merged snapshot.

    Layout: ``postings/bucket=B/pid=P/*.parquet`` + ``meta.json`` holding
    ``indexed_epoch`` and per-pid corpus stats. On refresh, partitions whose
    manifest file chains are identical between the indexed epoch and the
    current one are provably unchanged and never opened (the epoch-diff
    pruning contract, pipelines/diff.py); only changed partitions re-derive,
    and updates/deletes are handled for free because each partition's
    postings are REPLACED from its current merged snapshot. Falls back to a
    full rebuild when the indexed epoch is no longer retained, the partition
    layout changed (repartition), or ``num_buckets`` differs.

    Crash safety: postings dirs swap per-partition via os.replace and
    ``meta.json`` commits LAST — a crash mid-swap leaves the old meta, so
    the next refresh re-derives the same changed partitions (idempotent).

    Returns the new meta plus ``refreshed_pids`` (what was re-derived)."""
    import json
    import shutil

    from ..state.manifest import load_manifest

    man = load_manifest(table_dir)
    meta_path = os.path.join(index_dir, "meta.json")
    old = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            old = json.load(f)
    all_pids = sorted(man.partitions, key=int)
    pids: list[str] = all_pids
    if (
        old
        and old.get("num_buckets") == num_buckets
        and old.get("tokens_col") == tokens_col  # mixed-column index = garbage
    ):
        try:
            from ..pipelines.diff import changed_partitions

            changed = changed_partitions(
                table_dir, old["indexed_epoch"], man.epoch
            )
            pids = [str(c["pid"]) for c in changed]
        except Exception:
            old = None  # layout change / un-retained epoch → full rebuild
    else:
        old = None  # incompatible layout (bucket count / term column)

    post_dir = os.path.join(index_dir, "postings")
    if old is None:
        # full rebuild: wipe EVERYTHING first, or postings of partitions no
        # longer in the manifest (e.g. after a repartition) would survive
        # the per-pid clearing below and be read as live duplicates
        shutil.rmtree(post_dir, ignore_errors=True)
    if pids:
        files_by_pid = {
            p: (man.partitions[p].get("files") or []) for p in pids
        }

        def derive(batch: pa.Table) -> pa.Table:
            # read_partition_final: collapse tables index alive winners only
            # (cancelled keys' winner rows / null adjustment rows would
            # otherwise enter the postings as live documents)
            from ..stages.merge import read_partition_final

            out = []
            for pid in batch.column("pid").to_pylist():
                files = files_by_pid.get(str(pid)) or []
                snap = (
                    read_partition_final(
                        table_dir, files, man.schema, man.mode, man.sum_cols,
                        # postings touch doc_id + the token lists only
                        columns=["doc_id", tokens_col],
                    )
                    if files
                    else man.schema.empty_table()
                )
                out.append(_pid_postings(snap, int(pid), num_buckets, tokens_col))
            return pa.concat_tables(out)

        tmp_dir = post_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        ray.data.from_items([{"pid": int(p)} for p in pids]).map_batches(
            derive, batch_format="pyarrow", batch_size=1
        ).write_parquet(tmp_dir, partition_cols=["bucket", "pid"])

        # per-pid swap: clear every refreshed pid everywhere, then move the
        # freshly derived dirs in (deletes/emptied partitions handled by the
        # clearing step — they simply have no new dir)
        os.makedirs(post_dir, exist_ok=True)
        refreshed = set(pids)
        for bdir in os.listdir(post_dir):
            bpath = os.path.join(post_dir, bdir)
            for pdir in os.listdir(bpath):
                if pdir.split("=", 1)[-1] in refreshed:
                    shutil.rmtree(os.path.join(bpath, pdir))
        new_stats: dict[str, list[int]] = {}
        for bdir in sorted(os.listdir(tmp_dir)):
            bval = bdir.split("=", 1)[-1]
            src_b = os.path.join(tmp_dir, bdir)
            if bval == str(STATS_BUCKET):
                import pyarrow.parquet as pq

                for pdir in os.listdir(src_b):
                    srow = pq.read_table(
                        os.path.join(src_b, pdir), columns=["tf", "dl"]
                    )
                    new_stats[pdir.split("=", 1)[-1]] = [
                        int(pc.sum(srow.column("tf")).as_py() or 0),
                        int(pc.sum(srow.column("dl")).as_py() or 0),
                    ]
                continue
            dst_b = os.path.join(post_dir, bdir)
            os.makedirs(dst_b, exist_ok=True)
            for pdir in os.listdir(src_b):
                dst = os.path.join(dst_b, pdir)
                shutil.rmtree(dst, ignore_errors=True)
                os.replace(os.path.join(src_b, pdir), dst)
        shutil.rmtree(tmp_dir, ignore_errors=True)
    else:
        new_stats = {}

    per_pid = dict(old["per_pid"]) if old else {}
    for p in pids:
        per_pid.pop(p, None)
    per_pid.update(new_stats)
    per_pid = {p: per_pid[p] for p in all_pids if p in per_pid}
    meta = {
        "num_buckets": num_buckets,
        "indexed_epoch": man.epoch,
        "tokens_col": tokens_col,
        "doc_id_type": str(man.schema.field("doc_id").type),
        "per_pid": per_pid,
    }
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(meta_path + ".tmp", meta_path)
    return {**meta, "refreshed_pids": sorted(pids, key=int)}


def bm25_table_index_topk(
    index_dir: str,
    query_tokens: list[int],
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> pa.Table:
    """BM25 top-k over a table token index: opens only the postings buckets
    the query token ids hash to (across all table partitions), scores with
    the shared dense kernel. Terms are token ids (int64)."""
    import json

    import pyarrow.parquet as pq

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    empty = _empty_result(_type_from_name(meta.get("doc_id_type", "string")))
    n_docs = sum(v[0] for v in meta["per_pid"].values())
    sum_len = sum(v[1] for v in meta["per_pid"].values())
    if n_docs == 0:
        return empty
    avgdl = float(sum_len) / n_docs
    qarr = np.unique(np.asarray(list(query_tokens), dtype=np.int64))
    if len(qarr) == 0:
        raise ValueError("BM25 token query is empty")
    wanted = sorted(set(_token_buckets(qarr, meta["num_buckets"]).tolist()))
    paths = [
        os.path.join(pd_, name)
        for bk in wanted
        if os.path.isdir(bd := os.path.join(index_dir, "postings", f"bucket={bk}"))
        for pdir in sorted(os.listdir(bd))
        if os.path.isdir(pd_ := os.path.join(bd, pdir))
        for name in sorted(os.listdir(pd_))
        if name.endswith(".parquet")
    ]
    if not paths:
        return empty
    tbl = pa.concat_tables(
        pq.read_table(p, columns=["term", "doc_id", "tf", "dl"]) for p in paths
    )
    tbl = tbl.filter(pc.is_in(tbl.column("term"), value_set=pa.array(qarr, pa.int64())))
    if tbl.num_rows == 0:
        return empty
    udocs, tf, dl, df = _postings_dense(tbl, qarr)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    score = _bm25_scores(tf, dl, idf, avgdl, k1, b)
    return _rank_topk(udocs, score, k)
