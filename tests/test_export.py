"""Sorted range-partitioned export + zone-map reads: global sortedness,
range-read equivalence with a plain filter, file-level pruning, skew."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from clickhouse_data_pipeline_ray.pipelines.export import (
    ZONEMAP,
    export_sorted,
    read_sorted_range,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def exported(ray_session, tmp_path_factory):
    import ray

    out = str(tmp_path_factory.mktemp("sorted"))
    ds = ray.data.read_parquet(
        os.path.join(SF_DIR, "events.parquet"), columns=["event_id", "value"]
    )
    index = export_sorted(ds, "value", out, num_files=8)
    return out, index


def test_export_globally_sorted_and_complete(exported):
    out, index = exported
    dfs = [
        pq.read_table(os.path.join(out, z["file"])).to_pandas()
        for z in index["files"]
    ]
    concat = pd.concat(dfs, ignore_index=True)
    want = pq.read_table(
        os.path.join(SF_DIR, "events.parquet"), columns=["event_id", "value"]
    ).to_pandas()
    assert len(concat) == len(want) == index["total_rows"]  # nothing lost
    assert (concat["value"].values[1:] >= concat["value"].values[:-1]).all()
    assert sorted(concat["event_id"]) == sorted(want["event_id"])
    # zone ranges must be disjoint in file order
    zmax = [z["max"] for z in index["files"]]
    zmin = [z["min"] for z in index["files"]]
    assert all(a <= b for a, b in zip(zmax, zmin[1:]))


def test_range_read_equals_plain_filter(exported):
    out, _ = exported
    lo, hi = 20.0, 55.0
    got = read_sorted_range(out, lo, hi).to_pandas()
    want = pq.read_table(
        os.path.join(SF_DIR, "events.parquet"), columns=["event_id", "value"]
    ).to_pandas()
    want = want[(want["value"] >= lo) & (want["value"] <= hi)]
    assert sorted(got["event_id"]) == sorted(want["event_id"])


def test_range_read_prunes_files(exported):
    out, index = exported
    # a range inside ONE zone must plan exactly that zone's file
    z = index["files"][3]
    span = z["max"] - z["min"]
    lo, hi = z["min"] + 0.3 * span, z["min"] + 0.4 * span
    overlapping = [
        f for f in index["files"] if f["min"] <= hi and f["max"] >= lo
    ]
    assert len(overlapping) <= 2  # the zone (± a boundary-duplicate neighbor)
    got = read_sorted_range(out, lo, hi).to_pandas()
    assert (got["value"] >= lo).all() and (got["value"] <= hi).all()
    # fully out-of-range: empty but typed at the Dataset level (Ray's
    # to_pandas drops columns on ANY zero-row dataset — upstream behavior)
    empty = read_sorted_range(out, 1e12, 2e12)
    assert empty.count() == 0
    assert "value" in empty.schema().names


def test_nan_sort_values_do_not_poison_zones(ray_session, tmp_path):
    """NaNs searchsorted into the last bucket must not produce a NaN zone
    (which fails every overlap test and silently skips the file's valid rows
    on bounded reads): zones are min/max over non-NaN values, a null zone is
    always-overlapping, and the zone map JSON stays standard."""
    import json

    import ray

    vals = np.arange(1000, dtype=np.float64)
    vals[::50] = np.nan  # NaNs sprinkled in (land in the last range bucket)
    df = pd.DataFrame({"i": np.arange(len(vals)), "v": vals})
    out = str(tmp_path / "nan")
    index = export_sorted(ray.data.from_pandas(df).repartition(4), "v", out, num_files=4)
    # standard JSON (no bare NaN token) and no NaN zone bounds
    with open(os.path.join(out, ZONEMAP)) as f:
        reloaded = json.load(f)  # would raise on nonstandard output
    for z in reloaded["files"]:
        assert z["min"] is None or not np.isnan(z["min"])
        assert z["max"] is None or not np.isnan(z["max"])
    # a bounded read covering the top range returns the valid rows that share
    # a file with the NaNs
    got = read_sorted_range(out, 990.0, None).to_pandas()
    want = df[(df["v"] >= 990.0)]
    assert sorted(got["i"]) == sorted(want["i"])


def test_balanced_files_under_skew(ray_session, tmp_path):
    """Zipf-skewed sort keys must still yield ~equi-weight files (t-digest
    equi-quantile boundaries), not one hot file."""
    import ray

    rng = np.random.default_rng(7)
    vals = rng.zipf(1.3, 40_000).astype(np.float64)
    df = pd.DataFrame({"i": np.arange(len(vals)), "v": vals})
    out = str(tmp_path / "sk")
    index = export_sorted(
        ray.data.from_pandas(df).repartition(8), "v", out, num_files=8
    )
    rows = np.array([z["rows"] for z in index["files"]], dtype=float)
    assert rows.sum() == len(vals)
    # no single range holds the majority; low-cardinality head may merge a
    # few zones (np.unique on boundaries), so just bound the max share
    assert rows.max() / rows.sum() < 0.55


# ---------------------------------------------------------------------------
# Z-order clustered export
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def zordered(ray_session, tmp_path_factory):
    import ray

    out = str(tmp_path_factory.mktemp("zorder"))
    ds = ray.data.read_parquet(
        os.path.join(SF_DIR, "events.parquet"),
        columns=["event_id", "value", "user_id"],
    )
    from clickhouse_data_pipeline_ray.pipelines.export import export_zorder

    index = export_zorder(ds, ["value", "user_id"], out, num_files=16)
    return out, index


def _events_df():
    return pq.read_table(
        os.path.join(SF_DIR, "events.parquet"),
        columns=["event_id", "value", "user_id"],
    ).to_pandas()


def test_zorder_complete_and_zoned(zordered):
    out, index = zordered
    dfs = [
        pq.read_table(os.path.join(out, z["file"])).to_pandas()
        for z in index["files"]
    ]
    concat = pd.concat(dfs, ignore_index=True)
    want = _events_df()
    assert len(concat) == len(want) == index["total_rows"]  # nothing lost
    assert sorted(concat["event_id"]) == sorted(want["event_id"])
    # per-dimension zones are honest: every file's rows lie inside its zones
    for z in index["files"]:
        part = pq.read_table(os.path.join(out, z["file"])).to_pandas()
        for c in ("value", "user_id"):
            assert part[c].min() >= z[f"min_{c}"] - 1e-9
            assert part[c].max() <= z[f"max_{c}"] + 1e-9


def test_zorder_box_read_equals_plain_filter(zordered):
    from clickhouse_data_pipeline_ray.pipelines.export import read_zorder_box

    out, _ = zordered
    want = _events_df()
    boxes = [
        {"value": (20.0, 55.0), "user_id": (100.0, 140.0)},
        {"value": (None, 30.0)},
        {"user_id": (150.0, None)},
        {"value": (1e9, None)},  # empty result
    ]
    for box in boxes:
        got = read_zorder_box(out, box).to_pandas()
        m = pd.Series(True, index=want.index)
        for c, (lo, hi) in box.items():
            if lo is not None:
                m &= want[c] >= lo
            if hi is not None:
                m &= want[c] <= hi
        assert len(got) == int(m.sum()), box
        if len(got):  # Ray drops the schema of an all-filtered empty read
            assert sorted(got["event_id"]) == sorted(want[m]["event_id"]), box


def test_zorder_prunes_on_every_dimension(zordered):
    """The point of z-order vs a single-column sort: a tight box on EITHER
    dimension alone opens strictly fewer files than the whole layout."""
    import json

    from clickhouse_data_pipeline_ray.pipelines.export import ZORDER_MAP

    out, index = zordered
    with open(os.path.join(out, ZORDER_MAP)) as f:
        files = json.load(f)["files"]
    n_files = len(files)
    assert n_files >= 8

    want = _events_df()

    def opened(box):
        def ov(z):
            for c, (lo, hi) in box.items():
                if hi is not None and z[f"min_{c}"] is not None and z[f"min_{c}"] > hi:
                    return False
                if lo is not None and z[f"max_{c}"] is not None and z[f"max_{c}"] < lo:
                    return False
            return True

        return sum(1 for z in files if ov(z))

    v_lo, v_hi = want["value"].quantile(0.45), want["value"].quantile(0.55)
    u_lo, u_hi = want["user_id"].quantile(0.45), want["user_id"].quantile(0.55)
    assert opened({"value": (v_lo, v_hi)}) < n_files
    assert opened({"user_id": (u_lo, u_hi)}) < n_files
    # a 2-D box prunes at least as hard as either 1-D slice
    both = opened({"value": (v_lo, v_hi), "user_id": (u_lo, u_hi)})
    assert both <= opened({"value": (v_lo, v_hi)})
    assert both <= opened({"user_id": (u_lo, u_hi)})


def test_zorder_rejects_unknown_column(zordered):
    from clickhouse_data_pipeline_ray.pipelines.export import read_zorder_box

    out, _ = zordered
    with pytest.raises(ValueError, match="not z-order columns"):
        read_zorder_box(out, {"nope": (0, 1)})


def test_zorder_pruning_sound_for_arbitrary_boxes(zordered):
    """Property: for ANY box, the rows surviving a brute-force filter of the
    ORIGINAL data all live in files the zone map keeps — pruning can skip
    work but never rows. Hypothesis drives the box corners; file reads stay
    driver-side (no Ray execution per example)."""
    import json

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from clickhouse_data_pipeline_ray.pipelines.export import ZORDER_MAP

    out, _ = zordered
    with open(os.path.join(out, ZORDER_MAP)) as f:
        files = json.load(f)["files"]
    want = _events_df()
    parts = {
        z["file"]: pq.read_table(os.path.join(out, z["file"])).to_pandas()
        for z in files
    }
    v_min, v_max = want["value"].min(), want["value"].max()
    u_min, u_max = want["user_id"].min(), want["user_id"].max()

    bound = lambda lo, hi: st.one_of(st.none(), st.floats(lo, hi))  # noqa: E731

    @settings(max_examples=60, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(
        v_lo=bound(v_min - 1, v_max + 1),
        v_hi=bound(v_min - 1, v_max + 1),
        u_lo=bound(u_min - 1, u_max + 1),
        u_hi=bound(u_min - 1, u_max + 1),
    )
    def check(v_lo, v_hi, u_lo, u_hi):
        box = {"value": (v_lo, v_hi), "user_id": (u_lo, u_hi)}

        def keep(z):
            for c, (lo, hi) in box.items():
                if hi is not None and z[f"min_{c}"] is not None and z[f"min_{c}"] > hi:
                    return False
                if lo is not None and z[f"max_{c}"] is not None and z[f"max_{c}"] < lo:
                    return False
            return True

        kept = pd.concat(
            [parts[z["file"]] for z in files if keep(z)],
            ignore_index=True,
        ) if any(keep(z) for z in files) else want.iloc[0:0]
        m = pd.Series(True, index=want.index)
        for c, (lo, hi) in box.items():
            if lo is not None:
                m &= want[c] >= lo
            if hi is not None:
                m &= want[c] <= hi
        missing = set(want[m]["event_id"]) - set(kept["event_id"])
        assert not missing, (box, sorted(missing)[:5])

    check()


def test_zorder_nan_values_do_not_poison_zones(ray_session, tmp_path):
    """NaNs code into the last bin; per-dimension zones are min/max over
    non-NaN values (an all-NaN file gets a null, always-overlapping zone),
    and bounded box reads still return every valid row."""
    import json

    import ray

    from clickhouse_data_pipeline_ray.pipelines.export import (
        ZORDER_MAP,
        export_zorder,
        read_zorder_box,
    )

    rng = np.random.default_rng(5)
    a = np.arange(2000, dtype=np.float64)
    b = rng.permutation(2000).astype(np.float64)
    a[::40] = np.nan
    df = pd.DataFrame({"i": np.arange(2000), "a": a, "b": b})
    out = str(tmp_path / "znan")
    export_zorder(ray.data.from_pandas(df).repartition(4), ["a", "b"], out,
                  num_files=8)
    with open(os.path.join(out, ZORDER_MAP)) as f:
        zones = json.load(f)["files"]
    for z in zones:
        for c in ("a", "b"):
            assert z[f"min_{c}"] is None or not np.isnan(z[f"min_{c}"])
            assert z[f"max_{c}"] is None or not np.isnan(z[f"max_{c}"])
    got = read_zorder_box(out, {"a": (1900.0, None)}).to_pandas()
    want = df[df["a"] >= 1900.0]
    assert sorted(got["i"]) == sorted(want["i"])


def test_zone_index_null_zones_survive_json(ray_session):
    """_collect_zones goes through Arrow to_pylist — NOT pandas records —
    so an all-NaN bucket's null zone stays ``None`` through the committed
    JSON (strict, allow_nan=False) and the ``is None`` always-overlap
    guards in the readers can actually fire after reload."""
    import json

    import pyarrow as pa
    import ray

    from clickhouse_data_pipeline_ray.pipelines.export import _collect_zones

    tbl = pa.table(
        {
            "bucket": pa.array([1, 0], pa.int32()),
            "file": pa.array(["b.parquet", "a.parquet"]),
            "min": pa.array([None, 1.0], pa.float64()),
            "max": pa.array([None, 2.0], pa.float64()),
            "rows": pa.array([3, 5], pa.int64()),
        }
    )
    zones = _collect_zones(ray.data.from_arrow(tbl))
    assert [z["bucket"] for z in zones] == [0, 1]  # bucket-ordered
    assert zones[1]["min"] is None and zones[1]["max"] is None
    reloaded = json.loads(json.dumps({"files": zones}, allow_nan=False))
    assert reloaded["files"][1]["min"] is None


def test_zorder_validates_bit_widths(ray_session, tmp_path):
    """>64 total code bits and bits<1 are rejected up front; a num_files
    beyond the z-prefix space clamps (1 col x 8 bits caps at 256 files)
    instead of underflowing the prefix shift and corrupting every z-value."""
    import ray

    from clickhouse_data_pipeline_ray.pipelines.export import (
        export_zorder,
        read_zorder_box,
    )

    df = pd.DataFrame({"a": np.arange(200.0), "b": np.arange(200.0)})
    ds = ray.data.from_pandas(df)
    with pytest.raises(ValueError, match="64"):
        export_zorder(ds, [f"c{i}" for i in range(9)], str(tmp_path / "x"), bits=8)
    with pytest.raises(ValueError):
        export_zorder(ds, ["a"], str(tmp_path / "y"), bits=0)
    out = str(tmp_path / "clamp")
    index = export_zorder(ds.repartition(2), ["a"], out, num_files=512, bits=8)
    assert index["total_rows"] == 200
    assert len(index["files"]) <= 256
    got = read_zorder_box(out, {"a": (10.0, 20.0)}).to_pandas()
    want = df[(df["a"] >= 10.0) & (df["a"] <= 20.0)]
    assert sorted(got["a"]) == sorted(want["a"])
