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
