"""MinHash signature ledger (persisted near-dup index): build layout,
probe correctness vs brute-force signature overlap, guaranteed recall for
identical text, epoch extension, parameter pinning, bucket pruning, caps,
and string keys."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from clickhouse_data_pipeline_ray.functions.dedup import (
    MinHasher,
    build_minhash_index,
    incremental_neardup_dedup,
    minhash_bucket_paths,
)

BASE_TEXTS = {
    10: "the quick brown fox jumps over the lazy dog near the river bank",
    11: "pack my box with five dozen liquor jugs before the night falls",
    12: "a completely different document about distributed stream processing",
    13: "sphinx of black quartz judge my vow said the old professor",
}


def _docs(d: dict):
    return ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(list(d)), "text": pa.array(list(d.values()))}
        )
    )


def _ledger(tmp_path, **kw):
    idx = str(tmp_path / "mhidx")
    meta = build_minhash_index(_docs(BASE_TEXTS), idx, part="base", **kw)
    return idx, meta


def _brute_hits(meta, inc: dict, threshold: float) -> set:
    """Brute-force truth THROUGH THE SAME ESTIMATOR: a hit iff some band
    slice matches exactly AND signature overlap >= threshold."""
    h = MinHasher(
        num_perm=meta["num_perm"],
        bands=meta["bands"],
        shingle_k=meta["shingle_k"],
    )
    base_sigs = {k: h.signature(t) for k, t in BASE_TEXTS.items()}
    r = meta["num_perm"] // meta["bands"]
    out = set()
    for ik, it in inc.items():
        s = h.signature(it)
        for bk, bs in base_sigs.items():
            shares_band = any(
                np.array_equal(s[i * r : (i + 1) * r], bs[i * r : (i + 1) * r])
                for i in range(meta["bands"])
            )
            if shares_band and (s == bs).mean() >= threshold:
                out.add((ik, bk))
    return out


def test_build_layout_meta_and_pinning(ray_session, tmp_path):
    idx, meta = _ledger(tmp_path, num_buckets=8, shingle_k=2)
    assert meta["num_buckets"] == 8 and meta["shingle_k"] == 2
    assert sorted(os.listdir(os.path.join(idx, "parts"))) == ["base"]
    # a later part passes DIFFERENT params; the recorded ones must win
    build_minhash_index(
        _docs({50: "some new corpus document"}), idx, part="epoch-1",
        num_buckets=64, shingle_k=5,
    )
    import json

    with open(os.path.join(idx, "meta.json")) as f:
        assert json.load(f)["shingle_k"] == 2


def test_identical_text_always_hits(ray_session, tmp_path):
    idx, _ = _ledger(tmp_path, num_buckets=8, shingle_k=2)
    inc = {20: BASE_TEXTS[10], 21: "entirely unrelated fresh content here"}
    surv, hits = incremental_neardup_dedup(_docs(inc), idx, threshold=0.6)
    assert (20, 10) in set(zip(hits["doc_id"], hits["corpus_id"]))
    assert float(hits.set_index(["doc_id", "corpus_id"]).loc[(20, 10), "est_jaccard"]) == 1.0
    assert sorted(surv.to_pandas()["doc_id"]) == [21]


def test_hits_match_brute_force(ray_session, tmp_path):
    idx, meta = _ledger(tmp_path, num_buckets=8, shingle_k=2)
    inc = {
        30: BASE_TEXTS[11],  # exact dup
        31: "pack my box with five dozen liquor jugs before the night ends",
        32: "the quick brown fox jumps over the lazy dog near the river",
        33: "totally novel text with no overlap at all whatsoever",
    }
    _, hits = incremental_neardup_dedup(_docs(inc), idx, threshold=0.4)
    got = set(zip(hits["doc_id"], hits["corpus_id"]))
    assert got == _brute_hits(meta, inc, 0.4)
    assert hits.attrs["capped"] == 0


def test_extend_across_epochs(ray_session, tmp_path):
    idx, _ = _ledger(tmp_path, num_buckets=8, shingle_k=2)
    inc1 = {40: "brand new crawl document about oceanography and tides"}
    surv1, hits1 = incremental_neardup_dedup(_docs(inc1), idx, threshold=0.6)
    assert hits1.empty and surv1.count() == 1
    build_minhash_index(
        surv1.select_columns(["doc_id", "text"]), idx, part="epoch-1"
    )
    inc2 = {41: inc1[40], 42: "unrelated follow-up about alpine geology"}
    surv2, hits2 = incremental_neardup_dedup(_docs(inc2), idx, threshold=0.6)
    assert (41, 40) in set(zip(hits2["doc_id"], hits2["corpus_id"]))
    assert sorted(surv2.to_pandas()["doc_id"]) == [42]


def test_bucket_paths_prune_and_skip_tmp(ray_session, tmp_path):
    idx, meta = _ledger(tmp_path, num_buckets=8)
    nb = meta["num_buckets"]
    before = [p for b in range(nb) for p in minhash_bucket_paths(idx, b)]
    assert before, "ledger wrote no bucket files"
    for b in range(nb):
        for p in minhash_bucket_paths(idx, b):
            assert f"bkb={b}" in p
    tmp_part = os.path.join(idx, "parts", "x.tmp", "bkb=0")
    os.makedirs(tmp_part)
    open(os.path.join(tmp_part, "junk.parquet"), "w").close()
    assert [p for b in range(nb) for p in minhash_bucket_paths(idx, b)] == before


def test_hot_hash_cap_is_counted(ray_session, tmp_path):
    """With a cap of 1 corpus candidate per band_hash, planting the SAME
    text under many corpus ids forces drops — which must surface in
    hits.attrs['capped'], never only in worker logs."""
    idx = str(tmp_path / "mhidx")
    same = {k: BASE_TEXTS[10] for k in range(100, 108)}
    build_minhash_index(_docs(same), idx, part="base", num_buckets=4, shingle_k=2)
    _, hits = incremental_neardup_dedup(
        _docs({1: BASE_TEXTS[10]}), idx, threshold=0.6, max_per_hash=1
    )
    assert hits.attrs["capped"] > 0
    assert len(hits) == 1  # capped at one candidate per band hash


def test_string_keys(ray_session, tmp_path):
    idx = str(tmp_path / "mhidx")
    build_minhash_index(
        ray.data.from_arrow(
            pa.table({"doc_id": ["c-1", "c-2"],
                      "text": [BASE_TEXTS[10], BASE_TEXTS[12]]})
        ),
        idx, part="base", num_buckets=4, shingle_k=2,
    )
    surv, hits = incremental_neardup_dedup(
        ray.data.from_arrow(
            pa.table({"doc_id": ["n-1", "n-2"],
                      "text": [BASE_TEXTS[12], "fresh string-keyed text"]})
        ),
        idx, threshold=0.6,
    )
    assert set(zip(hits["doc_id"], hits["corpus_id"])) == {("n-1", "c-2")}
    assert sorted(surv.to_pandas()["doc_id"]) == ["n-2"]


def test_empty_increment(ray_session, tmp_path):
    idx, _ = _ledger(tmp_path, num_buckets=8)
    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    )
    surv, hits = incremental_neardup_dedup(empty, idx, threshold=0.6)
    assert hits.empty and surv.count() == 0
