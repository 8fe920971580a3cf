"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (all shuffle-aware):
- exact: content-hash in map_batches → hash-partitioned groupby → keep-first.
- MinHash-LSH: signatures per batch (actor pool, permutation params built once
  per actor) → explode to (band, band_hash) rows → groupby bands → candidate
  pairs → signature-estimated Jaccard verify → connected components.
- SimHash: 64-bit signature → pigeonhole band buckets (4×16 bits ⇒ any pair
  within Hamming distance 3 shares a band) → verify exact Hamming.
- n-gram Jaccard: blocking by (length bucket) → within-block pairwise verify
  in map_groups.
- embedding cosine: random-hyperplane LSH bucket → within-bucket pairwise
  cosine ≥ τ.

Candidate-pair sets are assumed small relative to the corpus (LSH parameters
chosen so bands are selective); only pairs/components ever reach the driver,
never the corpus. Union-find for components runs on the driver over that
bounded pair list — the documented partitioning assumption.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .textstats import fingerprint_batch

_MERSENNE = (1 << 61) - 1


def _multi_member_values(ds: ray.data.Dataset, col: str) -> set:
    """Values of ``col`` appearing in ≥2 rows, found WITHOUT a shuffle: each
    batch emits its value_counts partial (tiny (value, n) rows), the driver
    sums them. Buckets are overwhelmingly singletons in LSH blocking, so
    pre-filtering to multi-member buckets before the per-bucket pair stage
    removes ~all of the per-group overhead. Partials are O(distinct values);
    at extreme cardinality switch to groupby(col).count() instead."""
    import pyarrow.compute as pc

    def vc(b: pa.Table) -> pa.Table:
        v = pc.value_counts(b.column(col))
        return pa.table({col: v.field("values"), "n": v.field("counts")})

    parts = ds.map_batches(vc, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return set()
    totals = parts.groupby(col)["n"].sum()
    return set(totals[totals > 1].index)


def _filter_to_values(ds: ray.data.Dataset, col: str, values: set) -> ray.data.Dataset:
    """Keep rows whose ``col`` is in ``values`` (broadcast set, map-side)."""
    import pyarrow.compute as pc

    arr = pa.array(sorted(values))

    def f(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column(col), value_set=arr))

    return ds.map_batches(f, batch_format="pyarrow")


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", key_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep one row per identical text (smallest key wins — deterministic)."""
    with_fp = ds.map_batches(
        lambda b: fingerprint_batch(b, text_col), batch_format="pyarrow"
    )

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(key_col).head(1)

    return with_fp.groupby("fingerprint").map_groups(keep_first, batch_format="pandas")


def _shingle_hashes(words: np.ndarray, k: int) -> np.ndarray:
    """Hashes of word k-shingles via a rolling polynomial over word hashes."""
    from pandas.util import hash_array

    h = hash_array(words.astype(object), categorize=False).astype(np.uint64)
    if len(h) < k:
        return h if len(h) else np.array([0], dtype=np.uint64)
    with np.errstate(over="ignore"):
        acc = h[: len(h) - k + 1].copy()
        for j in range(1, k):
            acc = acc * np.uint64(0x100000001B3) + h[j : len(h) - k + 1 + j]
    return acc


class MinHasher:
    """Actor-pool stage: text → M-permutation MinHash signature, exploded to
    (band, band_hash, doc_id) rows for the LSH groupby."""

    def __init__(
        self,
        num_perm: int = 64,
        bands: int = 16,
        shingle_k: int = 3,
        text_col: str = "text",
        key_col: str = "doc_id",
        seed: int = 13,
    ):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        self.k, self.text_col, self.key_col = shingle_k, text_col, key_col

    def signature(self, text: str) -> np.ndarray:
        words = np.array(text.split(), dtype=object)
        sh = np.unique(_shingle_hashes(words, self.k)) % np.uint64(_MERSENNE)
        with np.errstate(over="ignore"):
            vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(
                _MERSENNE
            )
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_key, out_band, out_hash, out_sig = [], [], [], []
        from pandas.util import hash_array

        for key, text in zip(keys, texts):
            sig = self.signature(text)
            band_views = sig.reshape(self.bands, self.rows_per_band)
            # band index salted into the hash: one int64 bucket key suffices
            # for the LSH groupby (no composite key needed)
            bhash = hash_array(
                np.array(
                    [bytes([i]) + bv.tobytes() for i, bv in enumerate(band_views)],
                    dtype=object,
                ),
                categorize=False,
            ).astype(np.int64)
            out_key.extend([key] * self.bands)
            out_band.extend(range(self.bands))
            out_hash.extend(bhash.tolist())
            out_sig.extend([sig.astype(np.int64)] * self.bands)
        return pa.table(
            {
                self.key_col: pa.array(out_key),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
                "sig": pa.array(out_sig, pa.list_(pa.int64())),
            }
        )


def _bucket_pairs(group: pd.DataFrame, key_col: str) -> pd.DataFrame:
    g = group.sort_values(key_col).reset_index(drop=True)
    if len(g) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
    rows_a, rows_b, est = [], [], []
    sigs = [np.asarray(s) for s in g["sig"]]
    keys = list(g[key_col])
    for i in range(len(g)):
        for j in range(i + 1, len(g)):
            rows_a.append(keys[i])
            rows_b.append(keys[j])
            est.append(float((sigs[i] == sigs[j]).mean()))
    return pd.DataFrame({"doc_a": rows_a, "doc_b": rows_b, "est_jaccard": est})


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.6,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    text_col: str = "text",
    key_col: str = "doc_id",
    concurrency: int | tuple = 2,
) -> pd.DataFrame:
    """Near-duplicate candidate pairs with estimated Jaccard ≥ threshold.

    Returns the (bounded) pair list as pandas on the driver, deduplicated
    across bands and sorted for determinism.
    """
    exploded = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "num_perm": num_perm,
            "bands": bands,
            "shingle_k": shingle_k,
            "text_col": text_col,
            "key_col": key_col,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=0.5,
    ).materialize()
    # Pre-filter to colliding buckets (≥2 members) before any per-bucket
    # work: the pair stage then only ever sees true candidates.
    hot = _multi_member_values(exploded, "band_hash")
    if not hot:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
    candidates = _filter_to_values(exploded, "band_hash", hot)
    pairs = candidates.groupby("band_hash").map_groups(
        lambda g: _bucket_pairs(g, key_col), batch_format="pandas"
    )
    pdf = pairs.to_pandas()
    if pdf.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
    pdf = (
        pdf.groupby(["doc_a", "doc_b"], as_index=False)["est_jaccard"]
        .max()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    return pdf[pdf["est_jaccard"] >= threshold].reset_index(drop=True)


def minhash_dedup(
    ds: ray.data.Dataset, threshold: float = 0.6, **kwargs
) -> pd.DataFrame:
    """Cluster near-duplicates (connected components over verified pairs,
    union-find on the driver — pair list is bounded) and return
    (doc_id, cluster) with cluster = smallest member key."""
    pairs = minhash_lsh_pairs(ds, threshold=threshold, **kwargs)
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    members = sorted(parent)
    return pd.DataFrame(
        {"doc_id": members, "cluster": [find(m) for m in members]}
    )


class SimHasher:
    """Actor-pool stage: 64-bit SimHash + pigeonhole band columns."""

    def __init__(self, text_col: str = "text", key_col: str = "doc_id", n_bands: int = 4):
        self.text_col, self.key_col, self.n_bands = text_col, key_col, n_bands

    def simhash_batch(self, texts: list[str]) -> np.ndarray:
        """Whole-batch SimHash: one word-hash pass + segment-summed bit votes
        (np.add.reduceat over doc offsets) — no per-doc Python loop."""
        from pandas.util import hash_array

        words_per_doc = [t.split() for t in texts]
        lens = np.array([len(w) for w in words_per_doc], dtype=np.int64)
        sigs = np.zeros(len(texts), dtype=np.uint64)
        nonempty = np.flatnonzero(lens > 0)
        if len(nonempty) == 0:
            return sigs
        all_words = np.concatenate(
            [np.array(words_per_doc[i], dtype=object) for i in nonempty]
        )
        h = hash_array(all_words, categorize=False).astype(np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int32
        )
        votes2 = 2 * bits  # vote = sum(2b - 1) = 2*sum(b) - n
        offsets = np.zeros(len(nonempty), dtype=np.int64)
        offsets[1:] = np.cumsum(lens[nonempty])[:-1]
        seg = np.add.reduceat(votes2, offsets, axis=0)
        vote = seg - lens[nonempty][:, None]
        powers = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
        sigs[nonempty] = ((vote > 0).astype(np.uint64) * powers).sum(axis=1)
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).to_pylist()
        sigs = self.simhash_batch(batch.column(self.text_col).to_pylist())
        cols = {self.key_col: pa.array(keys), "simhash": pa.array(sigs.astype(np.int64))}
        width = 64 // self.n_bands
        for b in range(self.n_bands):
            seg = (sigs >> np.uint64(b * width)) & np.uint64((1 << width) - 1)
            cols[f"band{b}"] = pa.array(seg.astype(np.int64))
        return pa.table(cols)


def simhash_pairs(
    ds: ray.data.Dataset,
    max_hamming: int = 3,
    text_col: str = "text",
    key_col: str = "doc_id",
    concurrency: int | tuple = 2,
) -> pd.DataFrame:
    """Pairs within Hamming distance ``max_hamming`` (must be < n_bands for
    the pigeonhole blocking to be exhaustive)."""
    n_bands = 4
    assert max_hamming < n_bands
    sigs = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs={"text_col": text_col, "key_col": key_col, "n_bands": n_bands},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=0.5,
    )

    # One pass over all bands: explode each doc to (bucket, doc, simhash)
    # rows with the band id salted into the bucket key, so a single
    # hot-bucket prefilter + groupby covers every pigeonhole block.
    def explode(b: pa.Table) -> pa.Table:
        n = b.num_rows
        keys = pa.concat_arrays(
            [b.column(key_col).combine_chunks()] * n_bands
        )
        sh = pa.concat_arrays([b.column("simhash").combine_chunks()] * n_bands)
        buckets = np.concatenate(
            [
                b.column(f"band{i}").to_numpy() | np.int64(i << 16)
                for i in range(n_bands)
            ]
        )
        return pa.table(
            {key_col: keys, "simhash": sh, "bucket": pa.array(buckets, pa.int64())}
        )

    exploded = sigs.map_batches(explode, batch_format="pyarrow").materialize()

    def band_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(key_col).reset_index(drop=True)
        out_a, out_b, out_d = [], [], []
        sig = g["simhash"].to_numpy().astype(np.uint64)
        keys = list(g[key_col])
        for i in range(len(g)):
            x = sig[i] ^ sig[i + 1 :]
            d = np.array([bin(int(v)).count("1") for v in x])
            for off in np.flatnonzero(d <= max_hamming):
                out_a.append(keys[i])
                out_b.append(keys[i + 1 + int(off)])
                out_d.append(int(d[off]))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "hamming": out_d})

    hot = _multi_member_values(exploded, "bucket")
    if not hot:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
    cands = _filter_to_values(exploded, "bucket", hot)
    pdf = cands.groupby("bucket").map_groups(band_pairs, batch_format="pandas").to_pandas()
    if pdf.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
    return (
        pdf.groupby(["doc_a", "doc_b"], as_index=False)["hamming"]
        .min()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    key_col: str = "doc_id",
    block_col: str | None = None,
) -> pd.DataFrame:
    """Exact word n-gram Jaccard over blocked pairs. Blocking defaults to
    word-count buckets (a pair with Jaccard ≥ t has length ratio ≥ t, so
    adjacent log-buckets suffice); exact verify runs per block in map_groups."""

    def add_block(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_words = pc.count_substring_regex(
            batch.column(text_col), pattern=r"\S+"
        ).cast(pa.float64())
        bucket = pc.floor(pc.divide(pc.ln(pc.max_element_wise(n_words, 1.0)), np.log(1.3)))
        return batch.append_column("block", bucket.cast(pa.int32()))

    blocked = ds.map_batches(add_block, batch_format="pyarrow") if block_col is None else ds

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(key_col).reset_index(drop=True)
        grams = []
        for t in g[text_col]:
            words = t.split()
            grams.append(
                {tuple(words[i : i + n]) for i in range(max(1, len(words) - n + 1))}
            )
        out_a, out_b, out_j = [], [], []
        keys = list(g[key_col])
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                inter = len(grams[i] & grams[j])
                if inter == 0:
                    continue
                jac = inter / len(grams[i] | grams[j])
                if jac >= threshold:
                    out_a.append(keys[i])
                    out_b.append(keys[j])
                    out_j.append(round(jac, 6))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "jaccard": out_j})

    pdf = (
        blocked.groupby(block_col or "block")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    if pdf.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    return pdf.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


class HyperplaneLSH:
    """Actor-pool stage: random-hyperplane bucket for embedding vectors."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 5, vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.stack(batch.column(self.vec_col).to_pylist()).astype(np.float64)
        bits = (emb @ self.planes) > 0
        bucket = (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)
        return batch.append_column("bucket", pa.array(bucket.astype(np.int64)))


def embedding_neardup_pairs(
    ds: ray.data.Dataset,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int | tuple = 2,
) -> pd.DataFrame:
    """Embedding-cosine near-duplicates: hyperplane-LSH blocking, exact
    within-bucket cosine verify. (Near-identical vectors collide with high
    probability; bucket sizes stay bounded for spread data.)"""
    bucketed = ds.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes, "vec_col": vec_col},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=0.5,
    ).materialize()
    hot = _multi_member_values(bucketed, "bucket")
    if not hot:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
    bucketed = _filter_to_values(bucketed, "bucket", hot)

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(key_col).reset_index(drop=True)
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        emb = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        emb = emb / norm
        sims = emb @ emb.T
        ii, jj = np.triu_indices(len(g), k=1)
        keep = sims[ii, jj] >= threshold
        keys = g[key_col].to_numpy()
        return pd.DataFrame(
            {
                "id_a": keys[ii[keep]],
                "id_b": keys[jj[keep]],
                "cosine": np.round(sims[ii, jj][keep], 6),
            }
        )

    pdf = bucketed.groupby("bucket").map_groups(verify, batch_format="pandas").to_pandas()
    if pdf.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)
