"""SemDeDup (cluster-then-cosine semantic dedup): oracle vs brute force.

Planted near-duplicate groups are near-identical vectors, so they co-cluster
under ANY centroid set — the within-cluster pair search must find exactly
the brute-force all-pairs components, and exactly one member per component
survives (the farthest-from-centroid one under the paper's keep rule)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from clickhouse_data_pipeline_ray.functions.dedup import (
    connected_components,
    semdedup,
)

DIM = 16


def _unit(v):
    return v / np.linalg.norm(v)


def _corpus(seed=29, n_background=120, groups=6, group_size=3, jitter=1e-3):
    """Background spread + planted tight groups (pairwise cosine ≈ 1)."""
    rng = np.random.default_rng(seed)
    vecs, planted = [], []
    for i in range(n_background):
        vecs.append(_unit(rng.normal(size=DIM)))
    gid0 = len(vecs)
    for g in range(groups):
        base = _unit(rng.normal(size=DIM))
        ids = []
        for m in range(group_size):
            vecs.append(_unit(base + jitter * rng.normal(size=DIM)))
            ids.append(gid0 + g * group_size + m)
        planted.append(ids)
    return np.stack(vecs), planted


def _ds(vecs, ray):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32).tolist() for v in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        )
    ).repartition(4)


def _brute_components(vecs, threshold):
    emb = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = emb @ emb.T
    ii, jj = np.triu_indices(len(vecs), k=1)
    hit = sims[ii, jj] >= threshold
    if not hit.any():
        return {}
    return connected_components(ii[hit], jj[hit])


def test_semdedup_matches_brute_force_components(ray_session):
    vecs, planted = _corpus()
    eps = 0.02
    out = semdedup(_ds(vecs, ray_session), eps=eps, n_clusters=8, seed=5)
    want = _brute_components(vecs, 1.0 - eps)
    got = dict(zip(out["key"], out["rep"]))
    assert got == want
    # the planted groups are all present and each keeps exactly one member
    for ids in planted:
        rows = out[out["key"].isin(ids)]
        assert len(rows) == len(ids)
        assert rows["keep"].sum() == 1
    # global: one keeper per component
    per_rep = out.groupby("rep")["keep"].sum()
    assert (per_rep == 1).all()


def test_keep_far_prefers_farthest_from_centroid(ray_session):
    vecs, planted = _corpus(seed=31)
    out_far = semdedup(
        _ds(vecs, ray_session), eps=0.02, n_clusters=8, seed=5, keep="far"
    )
    out_min = semdedup(
        _ds(vecs, ray_session), eps=0.02, n_clusters=8, seed=5, keep="min_key"
    )
    # min_key: keeper is always the smallest id of its component
    for rep, grp in out_min.groupby("rep"):
        assert grp.loc[grp["keep"], "key"].iloc[0] == grp["key"].min()
    # same components either way, possibly different keepers
    assert dict(zip(out_far["key"], out_far["rep"])) == dict(
        zip(out_min["key"], out_min["rep"])
    )


def test_semdedup_deterministic_and_empty(ray_session):
    vecs, _ = _corpus(seed=37)
    a = semdedup(_ds(vecs, ray_session), eps=0.02, n_clusters=8, seed=5)
    b = semdedup(_ds(vecs, ray_session), eps=0.02, n_clusters=8, seed=5)
    pd.testing.assert_frame_equal(a, b)
    # a corpus with no near-dups returns an empty, well-typed frame
    rng = np.random.default_rng(3)
    spread = np.stack([_unit(rng.normal(size=DIM)) for _ in range(60)])
    out = semdedup(_ds(spread, ray_session), eps=1e-6, n_clusters=4, seed=5)
    assert out.empty and list(out.columns) == ["key", "rep", "keep"]


def test_cluster_cap_surfaced(ray_session):
    vecs, _ = _corpus(seed=41, n_background=40, groups=2)
    out = semdedup(
        _ds(vecs, ray_session), eps=0.02, n_clusters=2, seed=5, max_cluster=10
    )
    assert out.attrs["capped_buckets"] >= 1
    assert out.attrs["over_cap_docs"] > 0


def test_bad_keep_rejected(ray_session):
    vecs, _ = _corpus(seed=43, n_background=10, groups=1)
    with pytest.raises(ValueError, match="keep strategy"):
        semdedup(_ds(vecs, ray_session), keep="best")
