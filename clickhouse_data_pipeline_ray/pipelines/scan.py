"""Skip-index range scans: prune parts at the manifest before opening them.

The ClickHouse analog is a data-skipping index (``INDEX idx col TYPE minmax``)
over a MergeTree table: each part carries min/max marks for the indexed
column, and a ``WHERE col BETWEEN lo AND hi`` opens only parts whose marks
overlap the range. Here the marks are per-part ``[lo, hi]`` zones recorded in
the table manifest at part-write time (stages/merge.py column_zones) for the
columns declared in ``init_table(skip_cols=[...])``, and ``read_where`` plans
the pruned read with ZERO parquet I/O — a pure manifest computation, O(files)
driver work, which is what makes it hold at the 100-TB design point (the
manifest is KB per partition; the data is TB).

Pruning granularity is mode-aware for soundness:

- **append** tables: rows are immutable, so any merged-output row is a
  physical row in exactly one file → per-FILE pruning is sound.
- **upsert** tables: merge-on-read means a partition's output depends on its
  whole file chain, but every output VALUE is still a physical row value in
  some chain file (LWW picks rows, never synthesizes values) → pruning is
  sound at PARTITION granularity: skip a partition iff every file's zone is
  disjoint from the range.
- **sum** tables: merged sum columns are SUMS of per-file partials — an
  output value can land inside a range no partial is in — so a predicate on
  a ``sum_col`` disables pruning entirely (full scan, still correct). Other
  (LWW'd) columns prune like upsert.

A file with no zone for the column (written before the skip index existed,
or all-null/all-NaN values) counts as "always overlapping" — missing
information can only cost speed, never rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..state.manifest import load_manifest
from ..stages.merge import make_partition_reader, zone_bound


def _zone_overlaps(zone, lo, hi) -> bool:
    """Does a file's [zmin, zmax] zone intersect the (possibly one-sided)
    query range? Missing zone (None) = unknown = must read."""
    if zone is None:
        return True
    zmin, zmax = zone
    if lo is not None and zmax < lo:
        return False
    if hi is not None and zmin > hi:
        return False
    return True


def scan_plan(
    table_dir: str,
    col: str,
    lo=None,
    hi=None,
    epoch: int | None = None,
) -> dict:
    """Plan a skip-index range scan from the manifest only (no parquet I/O).

    Returns ``{"partitions": {pid: [files]}, "files_total", "files_pruned",
    "partitions_total", "partitions_pruned", "pruned_by_zones": bool}`` —
    the partitions/files the read must open. The plan dict doubles as the
    pruning evidence the spy tests assert on.
    """
    if lo is None and hi is None:
        raise ValueError("scan_plan needs at least one bound (lo and/or hi)")
    man = load_manifest(table_dir, epoch=epoch)
    field_type = (
        man.schema.field(col).type if col in man.schema.names else pa.string()
    )
    qlo, qhi = zone_bound(lo, field_type), zone_bound(hi, field_type)
    # zones are unusable (not recorded, or unsound for this predicate):
    # scan everything, prune nothing — correctness never depends on zones
    zones_usable = col in (man.skip_cols or []) and not (
        man.mode == "sum" and col in (man.sum_cols or [])
    )

    chains: dict[str, list[str]] = {}
    files_total = files_pruned = parts_pruned = 0
    parts_total = 0
    for pid, meta in man.partitions.items():
        files = meta.get("files") or []
        if not files:
            continue
        parts_total += 1
        files_total += len(files)
        if not zones_usable:
            chains[pid] = files
            continue
        zones = meta.get("zones") or {}
        hits = {
            f: _zone_overlaps((zones.get(f) or {}).get(col), qlo, qhi)
            for f in files
        }
        if not any(hits.values()):
            parts_pruned += 1
            files_pruned += len(files)
            continue
        if man.mode == "append":
            # immutable rows: per-file pruning is sound
            keep = [f for f in files if hits[f]]
            files_pruned += len(files) - len(keep)
            chains[pid] = keep
        else:
            # merge-on-read: the whole chain participates in LWW/sum
            chains[pid] = files
    return {
        "partitions": chains,
        "files_total": files_total,
        "files_pruned": files_pruned,
        "partitions_total": parts_total,
        "partitions_pruned": parts_pruned,
        "pruned_by_zones": zones_usable,
        "mode": man.mode,
    }


def read_where(
    table_dir: str,
    col: str,
    lo=None,
    hi=None,
    columns: list[str] | None = None,
    epoch: int | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Range scan ``WHERE col BETWEEN lo AND hi`` (bounds inclusive, either
    may be None for a one-sided range) with manifest-level skip-index pruning.

    Returns ``(dataset, plan)``; the dataset streams the EXACT predicate
    result (zones only decide which parts open — the row filter always runs),
    optionally projected to ``columns``. One embarrassingly parallel map over
    surviving partitions, no shuffle.
    """
    plan = scan_plan(table_dir, col, lo, hi, epoch=epoch)
    man = load_manifest(table_dir, epoch=epoch)
    schema = man.schema
    out_schema = (
        pa.schema([schema.field(c) for c in columns]) if columns else schema
    )
    if not plan["partitions"]:
        return ray.data.from_arrow(out_schema.empty_table()), plan

    ftype = schema.field(col).type
    slo = pa.scalar(lo).cast(ftype) if lo is not None else None
    shi = pa.scalar(hi).cast(ftype) if hi is not None else None
    reader = make_partition_reader(
        table_dir,
        man.schema_b64,
        plan["partitions"],
        mode=man.mode,
        sum_cols=man.sum_cols,
    )
    cols = list(columns) if columns else None

    def read_and_filter(batch: pa.Table) -> pa.Table:
        t = reader(batch)
        c = t.column(col)
        mask = None
        if slo is not None:
            mask = pc.greater_equal(c, slo)
        if shi is not None:
            m2 = pc.less_equal(c, shi)
            mask = m2 if mask is None else pc.and_(mask, m2)
        t = t.filter(pc.fill_null(mask, False))
        return t.select(cols) if cols else t

    items = [{"pid": int(pid)} for pid in sorted(plan["partitions"], key=int)]
    ds = ray.data.from_items(items, override_num_blocks=len(items)).map_batches(
        read_and_filter, batch_format="pyarrow", batch_size=None
    )
    return ds, plan
