"""Dedup operator tests with planted exact and near duplicates."""

import numpy as np
import pandas as pd
import pytest

import ray.data


def _docs_ds(ray_session):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden trees"
    )
    mutated = base.replace("lazy", "sleepy")  # near-dup of base
    other = (
        "completely different content about distributed data processing "
        "engines shuffle partitions actors and arrow record batches"
    )
    rows = [
        {"doc_id": "d-001", "text": base},
        {"doc_id": "d-002", "text": base},          # exact dup
        {"doc_id": "d-003", "text": mutated},       # near dup
        {"doc_id": "d-004", "text": other},
        {"doc_id": "d-005", "text": other + " extra tail words here"},
    ]
    return ray.data.from_items(rows)


def test_exact_dedup(ray_session):
    from clickhouse_data_pipeline_ray.functions.dedup import exact_dedup

    out = exact_dedup(_docs_ds(ray_session)).to_pandas()
    kept = sorted(out["doc_id"])
    assert "d-001" in kept and "d-002" not in kept  # smallest key wins
    assert len(kept) == 4


def test_minhash_lsh_finds_near_dups(ray_session):
    from clickhouse_data_pipeline_ray.functions.dedup import (
        minhash_dedup,
        minhash_lsh_pairs,
    )

    pairs = minhash_lsh_pairs(_docs_ds(ray_session), threshold=0.5, shingle_k=2)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert ("d-001", "d-002") in got      # exact pair: jaccard 1.0
    assert ("d-001", "d-003") in got or ("d-002", "d-003") in got
    assert not any("d-004" in p and "d-001" in p for p in got)

    clusters = minhash_dedup(_docs_ds(ray_session), threshold=0.5, shingle_k=2)
    cmap = dict(zip(clusters["doc_id"], clusters["cluster"]))
    assert cmap["d-001"] == cmap["d-002"] == cmap["d-003"] == "d-001"


def test_simhash_pairs(ray_session):
    from clickhouse_data_pipeline_ray.functions.dedup import simhash_pairs

    pairs = simhash_pairs(_docs_ds(ray_session), max_hamming=3)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert ("d-001", "d-002") in got  # identical text -> hamming 0
    hmap = dict(zip(zip(pairs["doc_a"], pairs["doc_b"]), pairs["hamming"]))
    assert hmap[("d-001", "d-002")] == 0


def test_ngram_jaccard_pairs(ray_session):
    from clickhouse_data_pipeline_ray.functions.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(_docs_ds(ray_session), threshold=0.5, n=2)
    got = {tuple(r) for r in pairs[["doc_a", "doc_b"]].itertuples(index=False)}
    assert ("d-001", "d-002") in got
    jmap = {
        (a, b): j
        for a, b, j in pairs[["doc_a", "doc_b", "jaccard"]].itertuples(index=False)
    }
    assert jmap[("d-001", "d-002")] == 1.0


def test_embedding_neardup(ray_session):
    from clickhouse_data_pipeline_ray.functions.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(3)
    base = rng.standard_normal(32)
    rows = [
        {"vec_id": 1, "embedding": base.tolist()},
        {"vec_id": 2, "embedding": (base + rng.standard_normal(32) * 0.01).tolist()},
        {"vec_id": 3, "embedding": rng.standard_normal(32).tolist()},
        {"vec_id": 4, "embedding": (-base).tolist()},
    ]
    ds = ray.data.from_items(rows)
    pairs = embedding_neardup_pairs(ds, dim=32, threshold=0.95)
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (1, 2) in got
    assert (1, 4) not in got  # opposite vector: cosine -1


# ---------------------------------------------------------------------------
# Exact small-scale oracles: all-pairs brute force at sf0.001 pins recall of
# every LSH blocking against its analytic bound, not just planted-pair hits.
# ---------------------------------------------------------------------------

SF_DIR = "/root/testdata/sf0.001"


def _sf_docs():
    df = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    return df.sort_values("doc_id").reset_index(drop=True)


def _gram_sets(texts, k):
    """Per-doc sorted-unique gram-hash sets via the SAME hash pipeline the
    operators use (identical hash space → identical true Jaccard)."""
    from clickhouse_data_pipeline_ray.functions.dedup import (
        _batch_shingle_hashes,
        _segment_unique,
    )

    flat, off = _batch_shingle_hashes(list(texts), k)
    gu, guoff = _segment_unique(flat, off)
    return [gu[guoff[i] : guoff[i + 1]] for i in range(len(guoff) - 1)]


def _true_jaccard_pairs(doc_ids, grams, floor):
    """All-pairs exact Jaccard >= floor (brute force; 500 docs -> 125k pairs)."""
    out = {}
    sets = [frozenset(g.tolist()) for g in grams]
    lens = [len(s) for s in sets]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            if inter == 0:
                continue
            jac = inter / (lens[i] + lens[j] - inter)
            if jac >= floor:
                out[(doc_ids[i], doc_ids[j])] = jac
    return out


def test_simhash_recall_exact_vs_bruteforce(ray_session):
    """Pigeonhole blocking (4 bands, hamming<=3) is EXHAUSTIVE: the operator's
    pair set must EQUAL brute-force all-pairs Hamming over the very same
    signatures — zero misses, zero extras."""
    from clickhouse_data_pipeline_ray.functions.dedup import (
        SimHasher,
        _hamming64,
        simhash_pairs,
    )

    df = _sf_docs()
    sigs = SimHasher().simhash_batch(list(df["text"]))
    ids = df["doc_id"].to_numpy()
    ii, jj = np.triu_indices(len(ids), k=1)
    d = _hamming64(sigs[ii], sigs[jj])
    keep = d <= 3
    expected = {
        (int(ids[i]), int(ids[j])): int(h)
        for i, j, h in zip(ii[keep], jj[keep], d[keep])
    }

    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    pairs = simhash_pairs(ds, max_hamming=3)
    got = {
        (int(a), int(b)): int(h)
        for a, b, h in pairs[["doc_a", "doc_b", "hamming"]].itertuples(index=False)
    }
    assert got == expected
    assert pairs.attrs["over_cap_docs"] == 0


def test_minhash_recall_vs_analytic_bound(ray_session):
    """Observed recall on true-Jaccard pairs >= the analytic LSH bound
    1-(1-j^r)^b minus slack (deterministic seeds -> stable number)."""
    from clickhouse_data_pipeline_ray.functions.dedup import minhash_lsh_pairs

    df = _sf_docs()
    truth = _true_jaccard_pairs(
        df["doc_id"].to_numpy(), _gram_sets(df["text"], 2), floor=0.35
    )
    assert truth, "sf0.001 corpus should contain pairs with jaccard >= 0.35"

    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(ds, threshold=0.2, shingle_k=2)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    # b=16 bands, r=4 rows: P(block) = 1-(1-j^4)^16 per pair
    probs = [1 - (1 - j**4) ** 16 for j in truth.values()]
    expected_recall = float(np.mean(probs))
    hit = sum((a, b) in got for (a, b) in truth)
    recall = hit / len(truth)
    assert recall >= expected_recall - 0.15, (recall, expected_recall, len(truth))


def test_ngram_recall_vs_analytic_bound(ray_session):
    """Content-blocked n-gram Jaccard: recall on pairs with true j >= 0.5 must
    meet the documented 1-(1-j^2)^16 blocking bound (~0.99 at j=0.5)."""
    from clickhouse_data_pipeline_ray.functions.dedup import ngram_jaccard_pairs

    df = _sf_docs()
    truth = _true_jaccard_pairs(
        df["doc_id"].to_numpy(), _gram_sets(df["text"], 2), floor=0.5
    )
    assert truth, "sf0.001 corpus should contain pairs with jaccard >= 0.5"

    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(ds, threshold=0.1, n=2)
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    probs = [1 - (1 - j**2) ** 16 for j in truth.values()]
    expected_recall = float(np.mean(probs))
    hit = sum((a, b) in got for (a, b) in truth)
    recall = hit / len(truth)
    assert recall >= expected_recall - 0.1, (recall, expected_recall, len(truth))
    # and every reported pair's exact jaccard must MATCH brute force
    full_truth = _true_jaccard_pairs(
        df["doc_id"].to_numpy(), _gram_sets(df["text"], 2), floor=0.1
    )
    for a, b, j in pairs[["doc_a", "doc_b", "jaccard"]].itertuples(index=False):
        assert abs(full_truth[(a, b)] - j) < 1e-5


def test_embedding_recall_vs_analytic_bound(ray_session):
    """Hyperplane-LSH near-dup: recall on brute-force cosine pairs >= the
    analytic (1-theta/pi)^n_planes single-band bound minus slack."""
    from clickhouse_data_pipeline_ray.functions.dedup import embedding_neardup_pairs

    base = pd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    rng = np.random.default_rng(11)
    planted = []
    for i, row in base.head(40).iterrows():
        v = np.asarray(row["embedding"], dtype=np.float64)
        planted.append(
            {"vec_id": int(row["vec_id"]) + 100_000,
             "embedding": (v + rng.standard_normal(len(v)) * 0.02 * np.linalg.norm(v) / np.sqrt(len(v))).tolist()}
        )
    df = pd.concat([base, pd.DataFrame(planted)], ignore_index=True)

    emb = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = emb @ emb.T
    ii, jj = np.triu_indices(len(df), k=1)
    keep = sims[ii, jj] >= 0.95
    ids = df["vec_id"].to_numpy()
    truth = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j]))): sims[i, j]
        for i, j in zip(ii[keep], jj[keep])
    }
    assert truth, "planted near-dups must exist at cosine >= 0.95"

    ds = ray.data.from_pandas(df.reset_index(drop=True))
    pairs = embedding_neardup_pairs(ds, dim=emb.shape[1], threshold=0.95)
    got = {(int(min(a, b)), int(max(a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    probs = [
        (1 - np.arccos(min(1.0, c)) / np.pi) ** 12 for c in truth.values()
    ]
    expected_recall = float(np.mean(probs))
    hit = sum(p in got for p in truth)
    recall = hit / len(truth)
    assert recall >= expected_recall - 0.2, (recall, expected_recall, len(truth))


def test_multi_member_counts_distributed_path_identical(ray_session):
    """Forcing the distributed groupby path (driver_value_limit=0) must give
    byte-identical hot-bucket counts AND identical LSH pairs."""
    from clickhouse_data_pipeline_ray.functions.dedup import (
        _multi_member_counts,
        minhash_lsh_pairs,
    )

    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    items = [{"v": x} for x in [1, 1, 2, 3, 3, 3, 4]]
    small = ray.data.from_items(items)
    driver = _multi_member_counts(small, "v", driver_value_limit=10**6)
    dist = _multi_member_counts(small, "v", driver_value_limit=0)
    assert driver == dist == {1: 2, 3: 3}

    p_driver = minhash_lsh_pairs(ds, threshold=0.2, shingle_k=2)
    p_dist = minhash_lsh_pairs(ds, threshold=0.2, shingle_k=2, driver_value_limit=0)
    pd.testing.assert_frame_equal(p_driver, p_dist)


def test_cap_drop_stats_reach_driver(ray_session):
    """A bucket over max_bucket must surface its drop count in result.attrs
    (driver-visible), not only worker stdout."""
    from clickhouse_data_pipeline_ray.functions.dedup import simhash_pairs

    rows = [{"doc_id": f"d-{i:03d}", "text": "identical text for every doc"} for i in range(10)]
    ds = ray.data.from_items(rows)
    pairs = simhash_pairs(ds, max_hamming=3, max_bucket=4)
    assert pairs.attrs["capped_buckets"] > 0
    assert pairs.attrs["over_cap_docs"] > 0
    # capped verify still returns the pairs among the first max_bucket members
    assert ("d-000", "d-001") in set(zip(pairs["doc_a"], pairs["doc_b"]))


def test_block_col_cap_stats_reach_driver(ray_session):
    """The user-blocking (block_col) path must surface bucket-cap drops in
    result.attrs too — previously its counts stayed {} so attrs reported 0
    while workers silently capped."""
    from clickhouse_data_pipeline_ray.functions.dedup import ngram_jaccard_pairs

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [{"doc_id": i, "blk": 7, "text": text} for i in range(10)]
    ds = ray.data.from_items(rows)
    pairs = ngram_jaccard_pairs(
        ds, threshold=0.5, n=2, block_col="blk", max_bucket=4
    )
    assert pairs.attrs["capped_buckets"] == 1
    assert pairs.attrs["over_cap_docs"] == 6  # 10 members, 4 verified
    # uncapped: all 45 identical pairs found, attrs report zero drops
    full = ngram_jaccard_pairs(
        ds, threshold=0.5, n=2, block_col="blk", max_bucket=64
    )
    assert len(full) == 45
    assert full.attrs["capped_buckets"] == 0 and full.attrs["over_cap_docs"] == 0


def test_segment_dedup_planted(ray_session):
    """First occurrence of a shared 10-word segment survives; later copies
    are dropped; a doc whose every segment was seen earlier vanishes."""
    import pandas as pd
    import ray

    from clickhouse_data_pipeline_ray.functions.dedup import segment_dedup

    seg_a = " ".join(f"a{i}" for i in range(10))
    seg_b = " ".join(f"b{i}" for i in range(10))
    tail = "x y z"  # short trailing segment
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                f"{seg_a} {seg_b}",         # both segments first seen here
                f"{seg_b} {tail}",          # seg_b dup -> only tail kept
                f"{seg_a} {seg_b}",         # all segments dup -> doc dropped
                f"{tail}",                  # 'x y z' first POSITION is doc 2
            ],
        }
    )
    out = (
        segment_dedup(ray.data.from_pandas(docs).repartition(3), seg_words=10)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2]
    row1 = out[out.doc_id == 1].iloc[0]
    assert row1.text_clean == f"{seg_a} {seg_b}"
    assert (row1.n_segments, row1.n_kept) == (2, 2)
    row2 = out[out.doc_id == 2].iloc[0]
    assert row2.text_clean == tail
    assert (row2.n_segments, row2.n_kept) == (2, 1)
    # doc 3 fully duplicate -> absent; doc 4's single segment 'x y z'
    # already appeared at an earlier position (doc 2 seg 1) -> absent
    assert 3 not in out.doc_id.values and 4 not in out.doc_id.values


def test_stage_kernels_handle_empty_batches(ray_session):
    """Ray unifies block schemas across batches, so every map-stage kernel
    must emit the SAME column names/types for an empty block as for data
    (regression: tile() dropped 'h', SimHasher inferred a null key type,
    HyperplaneLSH crashed on np.stack([]))."""
    import pyarrow as pa

    from clickhouse_data_pipeline_ray.functions.dedup import (
        HyperplaneLSH,
        SimHasher,
    )

    doc_schema = pa.schema([("doc_id", pa.string()), ("text", pa.string())])
    full = pa.table(
        {"doc_id": ["d-1", "d-2"], "text": ["a b c", "a b d"]}, schema=doc_schema
    )
    empty = doc_schema.empty_table()

    sh = SimHasher()
    assert sh(empty).schema.equals(sh(full).schema)
    assert sh(empty).num_rows == 0

    emb_schema = pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
    )
    vecs = pa.table(
        {"vec_id": [1, 2], "embedding": [[0.1, 0.2], [0.3, 0.4]]},
        schema=emb_schema,
    )
    lsh = HyperplaneLSH(dim=2)
    assert lsh(emb_schema.empty_table()).schema.equals(lsh(vecs).schema)


def test_segment_dedup_with_empty_blocks(ray_session):
    """An empty block in the input (routine under Ray's read splitting) must
    not change segment_dedup's result or crash the groupby stages."""
    import pyarrow as pa

    from clickhouse_data_pipeline_ray.functions.dedup import segment_dedup

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 x0 x1",
                     "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 y0 y1"],
        }
    )
    empty = docs.schema.empty_table()
    ds = ray.data.from_arrow([docs, empty])  # one empty block planted
    out = segment_dedup(ds, key_col="doc_id").to_pandas().sort_values("doc_id")
    # doc 2's first 10-word segment duplicates doc 1's and is dropped
    kept = dict(zip(out["doc_id"], out["n_kept"]))
    assert kept == {1: 2, 2: 1}
