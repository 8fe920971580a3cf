"""Distributed co-partitioned hash join vs a pandas-merge oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from clickhouse_data_pipeline_ray.stages.join import hash_join


def _sides(seed=11, n_left=5_000, n_right=1_200, n_keys=800):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "lv": rng.integers(0, 1000, n_left),
        }
    )
    # right misses some keys and has keys the left misses (outer coverage)
    right = pd.DataFrame(
        {
            "k": rng.integers(n_keys // 4, n_keys + n_keys // 4, n_right),
            "rv": rng.normal(size=n_right).round(4),
        }
    )
    return left, right


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (
        df[cols]
        .sort_values(cols, na_position="last")
        .reset_index(drop=True)
        .astype({c: "float64" for c in cols})
    )


@pytest.mark.parametrize(
    "how,pd_how",
    [
        ("inner", "inner"),
        ("left outer", "left"),
        ("full outer", "outer"),
    ],
)
def test_hash_join_matches_pandas(ray_session, how, pd_how):
    import ray

    left, right = _sides()
    got = hash_join(
        ray.data.from_pandas(left).repartition(7),
        ray.data.from_pandas(right).repartition(3),
        on="k",
        how=how,
    ).to_pandas()
    want = left.merge(right, on="k", how=pd_how)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_hash_join_semi_anti(ray_session):
    import ray

    left, right = _sides(seed=3)
    lds = ray.data.from_pandas(left).repartition(5)
    rds = ray.data.from_pandas(right).repartition(4)
    in_right = set(right["k"])

    semi = hash_join(lds, rds, on="k", how="left semi").to_pandas()
    want_semi = left[left["k"].isin(in_right)]
    pd.testing.assert_frame_equal(_canon(semi), _canon(want_semi))

    anti = hash_join(lds, rds, on="k", how="left anti").to_pandas()
    want_anti = left[~left["k"].isin(in_right)]
    pd.testing.assert_frame_equal(_canon(anti), _canon(want_anti))


def test_hash_join_multi_key_bucket_invariant(ray_session):
    """Composite keys join correctly and the result is invariant to the
    bucket count (pure hash partitioning)."""
    import ray

    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {
            "a": rng.integers(0, 20, 2_000),
            "b": rng.choice(["x", "y", "z"], 2_000),
            "lv": np.arange(2_000),
        }
    )
    right = pd.DataFrame(
        {
            "a": rng.integers(0, 25, 600),
            "b": rng.choice(["x", "y", "w"], 600),
            "rv": np.arange(600) * 2,
        }
    )
    want = left.merge(right, on=["a", "b"], how="inner")
    outs = []
    for nb in (8, 31):
        got = hash_join(
            ray.data.from_pandas(left).repartition(6),
            ray.data.from_pandas(right).repartition(2),
            on=["a", "b"],
            how="inner",
            n_buckets=nb,
        ).to_pandas()
        num = _canon(got.drop(columns=["b"]))
        outs.append((num, got))
        pd.testing.assert_frame_equal(num, _canon(want.drop(columns=["b"])))
    # string column equality too (canonical order by all columns)
    for _, got in outs:
        g = got.sort_values(sorted(got.columns)).reset_index(drop=True)
        w = want.sort_values(sorted(want.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            g[sorted(g.columns)], w[sorted(w.columns)], check_dtype=False
        )


def test_hash_join_rejects_bad_input(ray_session):
    import ray

    left = pd.DataFrame({"k": [1], "v": [1]})
    right_clash = pd.DataFrame({"k": [1], "v": [2]})
    with pytest.raises(ValueError, match="both sides"):
        hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right_clash), on="k"
        )
    right_typed = pd.DataFrame({"k": ["1"], "rv": [2]})
    with pytest.raises(TypeError, match="join key"):
        hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right_typed), on="k"
        )
    with pytest.raises(ValueError, match="how="):
        hash_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(pd.DataFrame({"k": [1], "rv": [2]})),
            on="k",
            how="cross",
        )


def test_hash_join_null_keys_sql_semantics(ray_session):
    """NULL join keys never match (SQL semantics, via Acero); left outer
    preserves null-key left rows with null right payload."""
    import ray

    left = pd.DataFrame({"k": [1.0, None, 2.0, None], "lv": [10, 20, 30, 40]})
    right = pd.DataFrame({"k": [1.0, None, 3.0], "rv": [100, 200, 300]})
    lds, rds = ray.data.from_pandas(left), ray.data.from_pandas(right)

    inner = hash_join(lds, rds, on="k", how="inner").to_pandas()
    assert inner["lv"].tolist() == [10] and inner["rv"].tolist() == [100]

    outer = hash_join(lds, rds, on="k", how="left outer").to_pandas()
    assert len(outer) == 4
    matched = outer[outer["rv"].notna()]
    assert matched["lv"].tolist() == [10]
    assert set(outer["lv"]) == {10, 20, 30, 40}


@pytest.mark.parametrize(
    "how,pd_how,bloom",
    [
        ("inner", "inner", "right"),
        ("inner", "inner", "left"),
        ("left outer", "left", "left"),
        ("right outer", "right", "right"),
    ],
)
def test_bloom_prefilter_never_changes_results(ray_session, how, pd_how, bloom):
    import ray

    left, right = _sides(seed=29)
    got = hash_join(
        ray.data.from_pandas(left).repartition(6),
        ray.data.from_pandas(right).repartition(3),
        on="k",
        how=how,
        bloom=bloom,
    ).to_pandas()
    want = left.merge(right, on="k", how=pd_how)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_bloom_prefilter_semi_anti_exact(ray_session):
    import ray

    left, right = _sides(seed=31)
    lds = ray.data.from_pandas(left).repartition(5)
    rds = ray.data.from_pandas(right).repartition(4)
    in_right = set(right["k"])

    semi = hash_join(lds, rds, on="k", how="left semi", bloom="right").to_pandas()
    want_semi = left[left["k"].isin(in_right)]
    pd.testing.assert_frame_equal(_canon(semi), _canon(want_semi))

    anti = hash_join(lds, rds, on="k", how="left anti", bloom="left").to_pandas()
    want_anti = left[~left["k"].isin(in_right)]
    pd.testing.assert_frame_equal(_canon(anti), _canon(want_anti))


def test_bloom_unsafe_combinations_rejected(ray_session):
    import ray

    left, right = _sides(seed=5)
    lds, rds = ray.data.from_pandas(left), ray.data.from_pandas(right)
    for how, bloom in [
        ("full outer", "left"),   # both sides' unmatched rows reach the output
        ("left outer", "right"),  # filters LEFT — the preserved side
        ("left anti", "right"),   # would drop the very rows anti must keep
    ]:
        with pytest.raises(ValueError, match="bloom"):
            hash_join(lds, rds, on="k", how=how, bloom=bloom)
    with pytest.raises(ValueError, match="bloom"):
        hash_join(lds, rds, on="k", how="inner", bloom="both")


def test_bloom_actually_drops_disjoint_keys(ray_session):
    """Definitely-absent keys must be dropped map-side: the keep-mask over a
    disjoint key range is (almost) all False, and present keys always pass."""
    import ray

    from clickhouse_data_pipeline_ray.stages.join import _bloom_keep, build_bloom

    small = pd.DataFrame({"k": np.arange(1_000), "v": np.zeros(1_000)})
    bits = build_bloom(ray.data.from_pandas(small).repartition(4), ["k"])
    present = pa.table({"k": pa.array(np.arange(1_000)), "v": pa.array(np.zeros(1_000))})
    absent = pa.table(
        {"k": pa.array(np.arange(50_000, 58_000)), "v": pa.array(np.zeros(8_000))}
    )
    assert _bloom_keep(present, ["k"], bits).all()  # no false negatives, ever
    fp_rate = _bloom_keep(absent, ["k"], bits).mean()
    assert fp_rate < 0.05  # ~1% expected at this sizing
