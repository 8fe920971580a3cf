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
