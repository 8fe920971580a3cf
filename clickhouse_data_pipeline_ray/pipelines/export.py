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
        from ..stages.partition import n_reduce_buckets

        num_files = n_reduce_buckets()
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

    zones = _collect_zones(
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("__rb")
        .map_groups(write_bucket, batch_format="pyarrow")
    )
    index = {
        "sort_col": col,
        "files": zones,
        "total_rows": int(sum(z["rows"] for z in zones)),
    }
    tmp = os.path.join(out_dir, f"{ZONEMAP}.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(index, f, indent=1, allow_nan=False)
    os.replace(tmp, os.path.join(out_dir, ZONEMAP))
    return index


def _collect_zones(zones_ds: ray.data.Dataset) -> list[dict]:
    """Zone rows as plain dicts, bucket-ordered. Goes through Arrow
    ``to_pylist`` — NOT pandas records — so a null zone (all-NaN bucket)
    stays ``None`` in the JSON index instead of degrading to a nonstandard
    ``NaN`` token that strict parsers reject and the ``is None`` overlap
    guards can't see after reload."""
    tbl = pa.concat_tables(
        list(zones_ds.iter_batches(batch_format="pyarrow", batch_size=None))
    )
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("bucket", "ascending")]))
    return tbl.to_pylist()


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


# ---------------------------------------------------------------------------
# Z-ORDER clustered export: multi-dimensional pruning (the Delta Lake
# OPTIMIZE ZORDER analog — Armbrust et al., "Delta Lake: High-Performance
# ACID Table Storage over Cloud Object Stores", VLDB 2020, §4.2). A single
# sort column prunes range reads on ONE dimension; interleaving the bits of
# several equi-depth-binned dimensions clusters the layout so a box
# predicate on ANY subset of them skips most files via per-dimension zones.
# ---------------------------------------------------------------------------

ZORDER_MAP = "_zordermap.json"


def _digests(ds: ray.data.Dataset, cols: list, delta: float = 400.0) -> dict:
    """One streamed pass → a merged t-digest per column (never two scans)."""

    def partial(b: pa.Table) -> pa.Table:
        names, means, weights = [], [], []
        for c in cols:
            v = b.column(c).cast(pa.float64()).to_numpy(zero_copy_only=False)
            d = TDigest.from_values(v[~np.isnan(v)], delta=delta)
            names.append(c)
            means.append(d.means.tobytes())
            weights.append(d.weights.tobytes())
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "means": pa.array(means, pa.large_binary()),
                "weights": pa.array(weights, pa.large_binary()),
            }
        )

    acc: dict = {c: [] for c in cols}
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for c, m, w in zip(
            batch.column("col").to_pylist(),
            batch.column("means").to_pylist(),
            batch.column("weights").to_pylist(),
        ):
            acc[c].append(
                TDigest(np.frombuffer(m, np.float64), np.frombuffer(w, np.float64),
                        delta=delta)
            )
    out = {}
    for c in cols:
        if not acc[c]:
            raise ValueError(f"no non-null values in z-order column {c!r}")
        out[c] = TDigest.merge_all(acc[c], delta=delta)
    return out


def _interleave(codes: list[np.ndarray], bits: int) -> np.ndarray:
    """Bit-interleave d equal-width integer codes into one z-value (column-
    major: bit b of dim i lands at position b*d + i)."""
    d = len(codes)
    z = np.zeros(len(codes[0]), dtype=np.uint64)
    for b in range(bits):
        for i, c in enumerate(codes):
            z |= ((c.astype(np.uint64) >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                b * d + i
            )
    return z


def export_zorder(
    ds: ray.data.Dataset,
    cols: list,
    out_dir: str,
    num_files: int | None = None,
    bits: int = 8,
) -> dict:
    """Write ``ds`` as a z-order-clustered parquet layout over ``cols``.

    One streamed pass builds a t-digest per dimension; each dimension is
    equi-depth binned into 2^bits codes (quantile cuts — skew-proof, unlike
    raw-value bit slicing), the codes are bit-interleaved into a z-value,
    and files are cut on the z-value's leading bits (balanced when the
    dimensions are not perfectly correlated — the documented assumption;
    correctness never depends on it). Each file records per-dimension
    min/max zones over its non-NaN values; :func:`read_zorder_box` opens
    only files whose zones overlap EVERY bounded dimension. Rows inside a
    file are z-sorted so parquet row-group stats prune further."""
    if not cols:
        raise ValueError("export_zorder needs at least one column")
    if bits < 1 or len(cols) * bits > 64:
        raise ValueError(
            f"len(cols)*bits must be in [1, 64] for uint64 z-values, got "
            f"{len(cols)}*{bits}={len(cols) * bits}"
        )
    if num_files is None:
        from ..stages.partition import n_reduce_buckets

        num_files = n_reduce_buckets()
    # more files than z-prefixes would underflow the shift; clamp so e.g.
    # 1 col × 8 bits caps at 256 files instead of corrupting every z-value
    file_bits = min(max(1, int(np.ceil(np.log2(num_files)))), len(cols) * bits)
    n_bins = 1 << bits
    digests = _digests(ds, cols)
    qs = np.arange(1, n_bins) / n_bins
    cuts = {
        c: np.unique(np.array([digests[c].quantile(q) for q in qs])) for c in cols
    }
    os.makedirs(out_dir, exist_ok=True)
    shift = np.uint64(len(cols) * bits - file_bits)

    def assign(b: pa.Table) -> pa.Table:
        codes = []
        for c in cols:
            v = b.column(c).cast(pa.float64()).to_numpy(zero_copy_only=False)
            # NaN sorts into the last bin (searchsorted convention), same as
            # export_sorted; zones ignore NaN so pruning stays correct
            raw = np.searchsorted(cuts[c], v, side="right").astype(np.uint64)
            # rescale ranks to the FULL code width: low-cardinality columns
            # collapse quantile cuts (np.unique), leaving the high bits of a
            # raw searchsorted code permanently zero — which would starve
            # the interleave (and the file split) of that dimension's bits
            codes.append(raw * np.uint64(n_bins) // np.uint64(len(cuts[c]) + 1))
        z = _interleave(codes, bits)
        b = b.append_column("__z", pa.array(z.astype(np.int64), pa.int64()))
        return b.append_column(
            "__rb", pa.array((z >> shift).astype(np.int32), pa.int32())
        )

    def write_bucket(g: pa.Table) -> pa.Table:
        rb = int(g.column("__rb")[0].as_py())
        t = g.take(pc.sort_indices(g, sort_keys=[("__z", "ascending")]))
        t = t.drop_columns(["__z", "__rb"])
        rel = f"zpart-{rb:05d}.parquet"
        tmp = os.path.join(out_dir, f"{rel}.tmp.{os.getpid()}")
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, os.path.join(out_dir, rel))
        row: dict = {
            "bucket": pa.array([rb], pa.int32()),
            "file": pa.array([rel], pa.string()),
            "rows": pa.array([t.num_rows], pa.int64()),
        }
        for c in cols:
            vals = t.column(c).cast(pa.float64()).to_numpy(zero_copy_only=False)
            finite = vals[~np.isnan(vals)]
            row[f"min_{c}"] = pa.array(
                [float(finite.min()) if len(finite) else None], pa.float64()
            )
            row[f"max_{c}"] = pa.array(
                [float(finite.max()) if len(finite) else None], pa.float64()
            )
        return pa.table(row)

    zones = _collect_zones(
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("__rb")
        .map_groups(write_bucket, batch_format="pyarrow")
    )
    index = {
        "zorder_cols": list(cols),
        "bits": bits,
        "files": zones,
        "total_rows": int(sum(z["rows"] for z in zones)),
    }
    tmp = os.path.join(out_dir, f"{ZORDER_MAP}.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(index, f, indent=1, allow_nan=False)
    os.replace(tmp, os.path.join(out_dir, ZORDER_MAP))
    return index


def read_zorder_box(out_dir: str, box: dict) -> ray.data.Dataset:
    """Box read over a z-order export: ``box`` maps column -> (lo, hi)
    (either bound may be None). Only files whose per-dimension zones overlap
    every bounded dimension are opened; the full box predicate is pushed
    down as a parquet filter. Null zones (all-NaN file for that dimension)
    always overlap — never silently skipped."""
    with open(os.path.join(out_dir, ZORDER_MAP)) as f:
        index = json.load(f)
    unknown = set(box) - set(index["zorder_cols"])
    if unknown:
        raise ValueError(f"not z-order columns: {sorted(unknown)}")

    def overlaps(z: dict) -> bool:
        for c, (lo, hi) in box.items():
            zmin, zmax = z.get(f"min_{c}"), z.get(f"max_{c}")
            if hi is not None and zmin is not None and zmin > hi:
                return False
            if lo is not None and zmax is not None and zmax < lo:
                return False
        return True

    paths = [
        os.path.join(out_dir, z["file"]) for z in index["files"] if overlaps(z)
    ]
    if not paths:
        paths = [os.path.join(out_dir, index["files"][0]["file"])]
    filters = []
    for c, (lo, hi) in box.items():
        if lo is not None:
            filters.append((c, ">=", lo))
        if hi is not None:
            filters.append((c, "<=", hi))
    return ray.data.read_parquet(
        paths, filter=_to_expression(filters) if filters else None
    )


# ---------------------------------------------------------------------------
# Deterministic shuffled export — training shards
# ---------------------------------------------------------------------------

LEHMER_M = 2147483647  # 2^31 - 1 (Park–Miller modulus, shared with the SQL
LEHMER_A = 48271  # sampling oracle in pipelines/queries.py)


def _shuffle_pos(keys: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic pseudo-random position for each key: a Lehmer step of
    ``key + seed`` for integer keys (SQL-reproducible: the sample_documents
    oracle's hash), a hashed equivalent for strings. Position is a pure
    function of (key, seed) — independent of partitioning, block order, or
    cluster size, so a shuffle is reproducible bit-for-bit anywhere."""
    if keys.dtype.kind in "iu":
        k = keys.astype(np.int64)
    else:
        from pandas.util import hash_array

        k = (hash_array(keys.astype(object)) % np.uint64(1 << 62)).astype(np.int64)
    return ((k + np.int64(seed)) * np.int64(LEHMER_A)) % np.int64(LEHMER_M)


def export_shuffled(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    num_shards: int = 64,
    seed: int = 1,
    key_col: str = "doc_id",
) -> dict:
    """Globally shuffle ``ds`` into ``num_shards`` training shards,
    deterministically from ``seed``.

    Training loaders want i.i.d.-ish order without paying a full
    ``random_shuffle`` of row IDENTITY state: here every row's (shard,
    position) is a pure hash of its key, so the plan is one map pass + ONE
    groupby exchange (the unavoidable data movement of any global shuffle),
    each shard sorted by position vectorized in its reduce group and written
    directly from the worker. Rows keep a ``_shuffle_pos`` column so a
    shard split across several files (Ray's dynamic block splitting) is
    still totally ordered — ``read_shard`` re-sorts, which is cheap and
    shard-local. Epoch N+1's order = a different seed, no data rewrite
    needed for single-epoch consumers that re-shard."""
    import shutil

    nsh = int(num_shards)

    def assign(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).to_numpy(zero_copy_only=False)
        pos = _shuffle_pos(keys, seed)
        b = b.append_column("_shuffle_pos", pa.array(pos))
        return b.append_column(
            "shard", pa.array((pos % nsh).astype(np.int32))
        )

    def sort_shard(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("_shuffle_pos", "ascending"), (key_col, "ascending")]
        )
        return g.take(idx)

    shuffled = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(sort_shard, batch_format="pyarrow")
    )
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shuffled.write_parquet(tmp, partition_cols=["shard"])
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    meta = {"num_shards": nsh, "seed": int(seed), "key_col": key_col}
    with open(os.path.join(out_dir, "_shuffle.json.tmp"), "w") as f:
        json.dump(meta, f)
    os.replace(
        os.path.join(out_dir, "_shuffle.json.tmp"),
        os.path.join(out_dir, "_shuffle.json"),
    )
    return meta


def read_shard(out_dir: str, shard: int) -> pa.Table:
    """One shard, in its deterministic shuffled order (driver-side latency
    path — a shard is one training worker's slice, not the corpus)."""
    d = os.path.join(out_dir, f"shard={shard}")
    if not os.path.isdir(d):
        return None
    t = pa.concat_tables(
        pq.read_table(os.path.join(d, f))
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    )
    with open(os.path.join(out_dir, "_shuffle.json")) as f:
        key_col = json.load(f)["key_col"]
    idx = pc.sort_indices(
        t, sort_keys=[("_shuffle_pos", "ascending"), (key_col, "ascending")]
    )
    return t.take(idx).drop_columns(["_shuffle_pos"])
