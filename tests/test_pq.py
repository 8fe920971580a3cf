"""Product quantization (IVFADC, Jegou et al. TPAMI 2011): kernel
identities (ADC == distance-to-reconstruction), compression contracts,
recall vs exact brute force, and the persisted-index lifecycle."""

import os

import numpy as np
import pyarrow as pa
import pytest

from clickhouse_data_pipeline_ray.functions.similarity import (
    _codes_from_arrow,
    _codes_to_arrow,
    _normalize,
    brute_force_topk,
    build_pq_index,
    pq_adc_dists,
    pq_decode,
    pq_encode,
    pq_index_topk,
    train_pq,
)


def _unit(n, dim, seed=0):
    rng = np.random.default_rng(seed)
    return _normalize(rng.normal(size=(n, dim)))


def test_reconstruction_error_decreases_with_m():
    x = _unit(600, 32, seed=1)
    errs = []
    for m in (2, 4, 8):
        books = train_pq(x, m=m, ksub=32, seed=3)
        err = np.mean(
            np.linalg.norm(x - pq_decode(pq_encode(x, books), books), axis=1)
        )
        errs.append(err)
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 0.9  # far below the unit-vector norm baseline


def test_adc_equals_distance_to_reconstruction():
    x = _unit(200, 16, seed=2)
    books = train_pq(x, m=4, ksub=16, seed=5)
    codes = pq_encode(x, books)
    q = _unit(1, 16, seed=9)[0]
    adc = pq_adc_dists(q, codes, books)
    exact = ((q[None, :] - pq_decode(codes, books)) ** 2).sum(axis=1)
    assert np.allclose(adc, exact)


def test_codes_arrow_roundtrip_including_slices():
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 256, size=(50, 8)).astype(np.uint8)
    arr = _codes_to_arrow(codes)
    assert arr.type == pa.binary(8)
    back = _codes_from_arrow(pa.chunked_array([arr]), 8)
    assert np.array_equal(back, codes)
    # sliced arrays carry an offset — the zero-copy reader must honor it
    sl = arr.slice(10, 20)
    back_sl = _codes_from_arrow(pa.chunked_array([sl]), 8)
    assert np.array_equal(back_sl, codes[10:30])


def test_dim_must_divide_m():
    with pytest.raises(ValueError, match="not divisible"):
        train_pq(_unit(50, 30), m=4)


def _clustered_corpus(n_per=200, n_clusters=4, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    centers = _normalize(rng.normal(size=(n_clusters, dim))) * 1.0
    vecs, ids = [], []
    for c in range(n_clusters):
        pts = _normalize(centers[c][None, :] + 0.15 * rng.normal(size=(n_per, dim)))
        vecs.append(pts)
        ids.extend(range(c * n_per, c * n_per + n_per))
    return np.concatenate(vecs), np.asarray(ids)


def test_pq_index_recall_layout_and_idempotent_rebuild(ray_session, tmp_path):
    import ray.data as rd

    vecs, ids = _clustered_corpus()
    tbl = pa.table({"vec_id": ids.tolist(), "embedding": list(vecs)})
    ds = rd.from_arrow(tbl).repartition(4)
    idx = str(tmp_path / "pq")
    meta = build_pq_index(
        ds, idx, n_centroids=4, m=4, ksub=32, sample_rows=800,
        concurrency=2,
    )
    assert meta["bytes_per_vector"] == 4  # 16 float32 dims -> 4 bytes
    # layout: one directory per coarse bucket, codes column fixed-size
    buckets = [
        d for d in os.listdir(os.path.join(idx, "codes"))
        if d.startswith("ivf_bucket=")
    ]
    assert 1 < len(buckets) <= 4

    queries = vecs[::100]
    qids = [f"q{i}" for i in range(len(queries))]
    got = pq_index_topk(idx, queries, qids, k=10, nprobe=4)
    assert set(got["query_id"]) == set(qids)
    assert (got.groupby("query_id")["rank"].max() == 10).all()

    # nprobe=1 opens ONLY the query's own coarse bucket — every neighbor
    # must come from the same cluster's id range
    one = pq_index_topk(idx, queries[:1], ["q0"], k=5, nprobe=1)
    assert len(one) == 5
    assert all(0 <= n < 200 for n in one["neighbor_id"])

    # rebuild into the same dir: search results identical (tmp+rename)
    build_pq_index(
        ds, idx, n_centroids=4, m=4, ksub=32, sample_rows=800, concurrency=2,
    )
    again = pq_index_topk(idx, queries, qids, k=10, nprobe=4)
    assert again.values.tolist() == got.values.tolist()


def test_pq_index_matches_reconstruction_oracle(ray_session, tmp_path):
    """ADC's exact contract: the index's top-k EQUALS brute-force cosine
    over the RECONSTRUCTED (decoded) corpus — quantization moves which
    vectors win, never how the winners are scored."""
    import ray.data as rd

    from clickhouse_data_pipeline_ray.functions.similarity import (
        _codes_from_arrow as cfa,
    )

    vecs, ids = _clustered_corpus(n_per=100)
    ds = rd.from_arrow(pa.table({"vec_id": ids.tolist(), "embedding": list(vecs)}))
    idx = str(tmp_path / "pq")
    build_pq_index(ds, idx, n_centroids=4, m=4, ksub=32, sample_rows=400)
    # the model commits ATOMICALLY with the codes it produced (inside the
    # swapped codes/ dir) — a crash can never pair codes with a stale model
    cents = np.load(os.path.join(idx, "codes", "_model", "centroids.npy"))
    books = np.load(os.path.join(idx, "codes", "_model", "codebooks.npy"))

    import pyarrow.parquet as pq_

    keys, recon = [], []
    for d in sorted(os.listdir(os.path.join(idx, "codes"))):
        if not d.startswith("ivf_bucket="):
            continue  # _model lives inside the codes dir
        b = int(d.split("=")[1])
        t = pa.concat_tables(
            pq_.read_table(os.path.join(idx, "codes", d, f))
            for f in sorted(os.listdir(os.path.join(idx, "codes", d)))
            if f.endswith(".parquet")
        )
        keys.append(t.column("vec_id").to_numpy(zero_copy_only=False))
        codes = cfa(t.column("codes"), 4)
        recon.append(pq_decode(codes, books) + cents[b])
    keys = np.concatenate(keys)
    recon = np.concatenate(recon)

    q = vecs[::50]
    qids = [f"q{i}" for i in range(len(q))]
    got = pq_index_topk(idx, q, qids, k=5, nprobe=4)
    for qi, qid in enumerate(qids):
        score = 1.0 - ((q[qi][None, :] - recon) ** 2).sum(axis=1) / 2.0
        order = np.lexsort((keys, -score.round(6)))[:5]
        want = keys[order].tolist()
        assert got[got.query_id == qid]["neighbor_id"].tolist() == want, qid


def test_pq_recall_on_planted_near_duplicates(ray_session, tmp_path):
    """Separable-margin recall: each query has 10 planted near-duplicates
    (cos ~0.999) among random background (cos ~0.6 max) — residual PQ at
    8 bytes/vector must keep the margin."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    background = _normalize(rng.normal(size=(760, 16)))
    queries = _normalize(rng.normal(size=(4, 16)))
    planted, pids = [], []
    for qi, q in enumerate(queries):
        pts = _normalize(q[None, :] + 0.02 * rng.normal(size=(10, 16)))
        planted.append(pts)
        pids.extend(range(10_000 + qi * 10, 10_000 + qi * 10 + 10))
    vecs = np.concatenate([background] + planted)
    ids = list(range(760)) + pids
    tbl = pa.table({"vec_id": ids, "embedding": list(vecs)})

    # ground truth: the planted set IS the exact top-10
    exact = brute_force_topk(tbl, queries, ["a", "b", "c", "d"], k=10,
                             exclude_self=False)
    for qi, qid in enumerate(["a", "b", "c", "d"]):
        assert set(exact[exact.query_id == qid]["neighbor_id"]) == set(
            range(10_000 + qi * 10, 10_000 + qi * 10 + 10)
        )

    ds = rd.from_arrow(tbl).repartition(4)
    idx = str(tmp_path / "pq")
    build_pq_index(ds, idx, n_centroids=4, m=8, ksub=32, sample_rows=800)
    got = pq_index_topk(idx, queries, ["a", "b", "c", "d"], k=10, nprobe=4)
    recall = np.mean([
        len(
            set(got[got.query_id == qid]["neighbor_id"])
            & set(range(10_000 + qi * 10, 10_000 + qi * 10 + 10))
        ) / 10.0
        for qi, qid in enumerate(["a", "b", "c", "d"])
    ])
    assert recall >= 0.9, recall


def test_pq_scores_approximate_cosine(ray_session, tmp_path):
    """score = 1 - d2/2 of the QUANTIZED vector ~ true cosine, within the
    reconstruction error bound."""
    import ray.data as rd

    vecs, ids = _clustered_corpus(n_per=100)
    ds = rd.from_arrow(pa.table({"vec_id": ids.tolist(), "embedding": list(vecs)}))
    idx = str(tmp_path / "pq")
    build_pq_index(ds, idx, n_centroids=4, m=8, ksub=32, sample_rows=400)
    q = vecs[:3]
    got = pq_index_topk(idx, q, ["a", "b", "c"], k=3, nprobe=4)
    for _, row in got.iterrows():
        true_cos = float(
            vecs[ids == row.neighbor_id][0] @ q[{"a": 0, "b": 1, "c": 2}[row.query_id]]
        )
        assert abs(row.score - true_cos) < 0.2


def test_pq_rerank_recovers_exact_topk(ray_session, tmp_path):
    """Exact re-ranking of ADC candidates against the original vectors
    recovers the TRUE top-k even on a near-tie corpus where pure ADC
    cannot (the FAISS IVFPQR refinement shape)."""
    import pyarrow.parquet as pq_
    import ray.data as rd

    vecs, ids = _clustered_corpus(n_per=150)
    tbl = pa.table({"vec_id": ids.tolist(), "embedding": list(vecs)})
    src = str(tmp_path / "emb.parquet")
    pq_.write_table(tbl, src)
    ds = rd.from_arrow(tbl).repartition(4)
    idx = str(tmp_path / "pq")
    build_pq_index(ds, idx, n_centroids=4, m=4, ksub=32, sample_rows=600)

    queries = vecs[::75]
    qids = [f"q{i}" for i in range(len(queries))]
    exact = brute_force_topk(tbl, queries, qids, k=5, exclude_self=False)
    got = pq_index_topk(
        idx, queries, qids, k=5, nprobe=4, rerank=60, source=src
    )
    for qid in qids:
        assert (
            got[got.query_id == qid]["neighbor_id"].tolist()
            == exact[exact.query_id == qid]["neighbor_id"].tolist()
        ), qid
    # reranked scores are TRUE cosines
    assert got[got["rank"] == 1]["score"].min() > 0.999  # self-match

    with pytest.raises(ValueError, match="source"):
        pq_index_topk(idx, queries, qids, rerank=10)
