"""Sorted, range-partitioned parquet export with a zone-map index.

ClickHouse tables are physically ORDER BY-sorted and reads prune granules by
the sparse primary index (/root/reference/etl/clickhouse_schema/init.sql:
13-15, 27-29); the lake analog is a globally sorted, range-partitioned
parquet layout plus a per-file min/max index. This module produces one —
the TeraSort shape, built from this repo's own primitives:

1. **Boundary sampling** — one streamed pass builds a mergeable t-digest of
   the sort column (functions/sketch.py, O(blocks × δ) driver state at any
   corpus size) and cuts it at N-1 equi-weight quantiles → N balanced key
   ranges regardless of distribution skew.
2. **Range shuffle** — each batch assigns `bucket = searchsorted(bounds,
   col)` map-side; ONE `groupby(bucket)` exchange co-locates each range.
3. **Sorted write** — each bucket sorts its slice vectorized (Arrow
   ``sort_indices``/``take``) and writes `part-{bucket:05d}.parquet`
   DIRECTLY from the worker (no driver materialization), returning only a
   zone-map row (path, min, max, rows). File order = range order, so the
   concatenation of files in name order is globally sorted.
4. **Zone-map index** — the driver commits `_zonemap.json` (atomic tmp +
   rename). ``read_sorted_range`` opens ONLY files whose [min, max]
   overlaps the requested range; inside a file, parquet row-group stats
   prune further because rows are sorted.

Ray Data note: ``ds.sort`` performs the same boundary-sampled range shuffle
internally, but its output files don't expose range metadata — the point
here is the PERSISTED layout (pruned reads later, resumable per-range
consumers), not the sort itself.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..functions.sketch import TDigest

ZONEMAP = "_zonemap.json"


def _boundaries(ds: ray.data.Dataset, col: str, n: int, delta: float = 400.0) -> np.ndarray:
    """n-1 equi-weight cut points of ``col`` via merged per-block t-digests."""

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(col).cast(pa.float64()).to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        d = TDigest.from_values(v, delta=delta)
        return pa.table(
            {
                "means": pa.array([d.means.tobytes()], pa.large_binary()),
                "weights": pa.array([d.weights.tobytes()], pa.large_binary()),
            }
        )

    parts = []
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for m, w in zip(
            batch.column("means").to_pylist(), batch.column("weights").to_pylist()
        ):
            parts.append(
                TDigest(np.frombuffer(m, np.float64), np.frombuffer(w, np.float64),
                        delta=delta)
            )
    if not parts:
        raise ValueError(f"no non-null values in sort column {col!r}")
    digest = TDigest.merge_all(parts, delta=delta)
    qs = np.arange(1, n) / n
    bounds = np.array([digest.quantile(q) for q in qs])
    return np.unique(bounds)  # collapsed duplicates on low-cardinality cols


def export_sorted(
    ds: ray.data.Dataset,
    col: str,
    out_dir: str,
    num_files: int | None = None,
) -> dict:
    """Write ``ds`` as a globally sorted, range-partitioned parquet layout
    under ``out_dir`` and commit its zone-map index. Returns the index."""
    if num_files is None:
        num_files = max(8, 2 * int(ray.cluster_resources().get("CPU", 8)))
    bounds = _boundaries(ds, col, num_files)
    os.makedirs(out_dir, exist_ok=True)

    def assign(b: pa.Table) -> pa.Table:
        v = b.column(col).cast(pa.float64()).to_numpy(zero_copy_only=False)
        return b.append_column(
            "__rb", pa.array(np.searchsorted(bounds, v, side="right").astype(np.int32))
        )

    def write_bucket(g: pa.Table) -> pa.Table:
        rb = int(g.column("__rb")[0].as_py())
        t = g.drop_columns(["__rb"])
        t = t.take(pc.sort_indices(t, sort_keys=[(col, "ascending")]))
        rel = f"part-{rb:05d}.parquet"
        tmp = os.path.join(out_dir, f"{rel}.tmp.{os.getpid()}")
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, os.path.join(out_dir, rel))
        # zone over NON-NaN values only: pc.min/max return NaN when the
        # bucket holds any NaN (NaNs searchsorted into the last bucket), and
        # a NaN zone fails every overlap test — bounded reads would silently
        # skip the file's valid rows (and json would emit a nonstandard NaN
        # token). An all-NaN bucket gets a null zone = always-overlapping.
        vals = t.column(col).cast(pa.float64()).to_numpy(zero_copy_only=False)
        finite = vals[~np.isnan(vals)]
        zmin = float(finite.min()) if len(finite) else None
        zmax = float(finite.max()) if len(finite) else None
        return pa.table(
            {
                "bucket": pa.array([rb], pa.int32()),
                "file": pa.array([rel], pa.string()),
                "min": pa.array([zmin], pa.float64()),
                "max": pa.array([zmax], pa.float64()),
                "rows": pa.array([t.num_rows], pa.int64()),
            }
        )

    zones = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("__rb")
        .map_groups(write_bucket, batch_format="pyarrow")
        .to_pandas()
        .sort_values("bucket")
    )
    index = {
        "sort_col": col,
        "files": zones.to_dict("records"),
        "total_rows": int(zones["rows"].sum()),
    }
    tmp = os.path.join(out_dir, f"{ZONEMAP}.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(index, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, ZONEMAP))
    return index


def read_sorted_range(
    out_dir: str, lo: float | None = None, hi: float | None = None
) -> ray.data.Dataset:
    """Range read over a sorted export: only files whose zone [min, max]
    overlaps [lo, hi] are opened (then parquet row-group stats prune inside
    each file); bounds are inclusive, None = unbounded."""
    with open(os.path.join(out_dir, ZONEMAP)) as f:
        index = json.load(f)
    col = index["sort_col"]
    # a null zone (all-NaN bucket) always overlaps — never silently skipped
    paths = [
        os.path.join(out_dir, z["file"])
        for z in index["files"]
        if (hi is None or z["min"] is None or z["min"] <= hi)
        and (lo is None or z["max"] is None or z["max"] >= lo)
    ]
    if not paths:
        # keep one file and let the pushed-down filter empty it: Ray drops
        # the schema of a zero-block dataset, a filtered read keeps it typed
        paths = [os.path.join(out_dir, index["files"][0]["file"])]
    filters = []
    if lo is not None:
        filters.append((col, ">=", lo))
    if hi is not None:
        filters.append((col, "<=", hi))
    return ray.data.read_parquet(paths, filter=_to_expression(filters))


def _to_expression(filters: list[tuple]):
    import pyarrow.dataset as pads

    expr = None
    for col, op, val in filters:
        f = pads.field(col)
        e = f >= val if op == ">=" else f <= val
        expr = e if expr is None else expr & e
    return expr
