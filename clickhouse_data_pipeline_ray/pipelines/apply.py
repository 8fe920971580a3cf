"""Epoch driver: compose the stages into one Ray Data job and commit.

The analog of the reference's sync cycle (`ETLPipeline.run_sync_cycle`,
/root/reference/etl/core/pipeline.py:332-365: extract → transform → load with
an in-memory watermark) and of its Kafka poll loop
(/root/reference/stream_etl/core/consumer.py:86-109), unified into one
resumable micro-batch loop:

    pending segments (> manifest watermark, name-pruned)
      → read_parquet (grouped by schema; union)             [streamed blocks]
      → map_batches(normalize + pid/salt + LWW pre-compact) [stateless tasks]
      → (hot pids only) groupby(pid, salt).map_groups(compact)   [salted L1]
      → groupby(pid).map_groups(MergeApply actor pool)      [stateful merge]
      → driver: rename tmp snapshots + atomic manifest swap [exactly-once]

The per-epoch change volume is bounded by ``max_segments``; the normalized
change set is materialized once (bounded) so hot-partition detection and the
merge pass don't re-read the WAL. Driver never holds row data — only O(P)
stats rows from the merge stage.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..schemas import (
    BASE_SCHEMA,
    SNAPSHOT_SCHEMA,
    schema_to_b64,
    snapshot_schema_of,
    unify,
)
from ..sources.wal import Segment, pending_segments
from ..stages.merge import MergeApply
from ..stages.normalize import compact_group, make_normalize_fn
from ..state.manifest import (
    Manifest,
    commit_manifest,
    gc_stale_files,
    init_table,
    load_manifest,
)


@dataclass
class ApplyConfig:
    max_segments: int | None = None       # per-epoch segment cap (backpressure)
    salt_factor: int = 8                  # sub-keys per hot partition
    hot_ratio: float = 4.0                # pid is "hot" if its rows > ratio × mean
    merge_concurrency: int | tuple = (1, 8)
    batch_size: int | None = None         # normalize batch size (None = blocks)
    gc: bool = True


def create_table(table_dir: str, num_partitions: int = 64, schema: pa.Schema | None = None) -> Manifest:
    return init_table(table_dir, schema or SNAPSHOT_SCHEMA, num_partitions)


def _epoch_change_schema(man: Manifest, segs: list[Segment]) -> pa.Schema:
    """Unified schema for this epoch = snapshot schema ⊔ all segment schemas
    (Arrow schema unification: column add + permissive widen). The engine's
    schema-evolution point, replacing the reference's per-value parsers
    (/root/reference/stream_etl/core/processor.py:41-141)."""
    seg_snap = [snapshot_schema_of(pq.read_schema(s.path)) for s in segs]
    snap = unify([man.schema] + seg_snap)
    return snap.insert(1, pa.field("op", pa.string())), snap


def _read_segments(segs: list[Segment]) -> ray.data.Dataset:
    """Read segments grouped by file schema (a WAL spanning a schema change
    has heterogeneous files; per-group reads + union keep each read clean)."""
    groups: dict[bytes, list[str]] = {}
    for s in segs:
        key = pq.read_schema(s.path).serialize().to_pybytes()
        groups.setdefault(key, []).append(s.path)
    datasets = [ray.data.read_parquet(paths) for paths in groups.values()]
    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)
    return ds


def apply_once(table_dir: str, wal_dir: str, cfg: ApplyConfig | None = None) -> dict | None:
    """Apply one epoch of pending WAL segments. Returns stats, or None when
    caught up. Ray must already be initialized by the caller."""
    cfg = cfg or ApplyConfig()
    t0 = time.perf_counter()
    man = load_manifest(table_dir)
    watermark = man.watermark
    segs = pending_segments(wal_dir, watermark, cfg.max_segments)
    if not segs:
        return None

    change_schema, snap_schema = _epoch_change_schema(man, segs)
    epoch = man.epoch + 1
    epoch_max_lsn = max(s.last_lsn for s in segs)

    normalize = make_normalize_fn(
        change_schema,
        man.num_partitions,
        salt_factor=cfg.salt_factor,
        watermark=watermark,
    )
    changes = _read_segments(segs).map_batches(
        normalize,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.batch_size,
    )
    # Bounded by the per-epoch segment cap; lets hot-pid detection and the
    # merge pass share one scan of the WAL.
    changes = changes.materialize()
    # Raw change events in this epoch (pre-compaction), from parquet metadata.
    n_events = sum(pq.ParquetFile(s.path).metadata.num_rows for s in segs)

    # Skew detection: per-pid post-compaction row counts via per-batch
    # partials (no shuffle — only tiny (pid, n) rows leave the map stage,
    # the combiner pattern from the Ray guide).
    hot_pids: list[int] = []
    if cfg.salt_factor > 1 and man.num_partitions > 1:
        def pid_counts(b: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            vc = _pc.value_counts(b.column("pid"))
            return pa.table(
                {"pid": vc.field("values"), "n": vc.field("counts")}
            )

        partials = changes.map_batches(pid_counts, batch_format="pyarrow").to_pandas()
        if not partials.empty:
            counts = partials.groupby("pid")["n"].sum()
            if len(counts) > 1:
                hot = counts[counts > cfg.hot_ratio * counts.mean()]
                hot_pids = sorted(int(p) for p in hot.index)

    if hot_pids:
        # Two-level salted merge: L1 compacts (pid, salt) sub-groups in
        # parallel (each doc_id lives in exactly one sub-group, so L1 output
        # is fully LWW-compacted per key); L2 is the per-pid base merge.
        changes = changes.groupby(["pid", "salt"]).map_groups(
            compact_group, batch_format="pyarrow"
        )

    stats_ds = changes.groupby("pid").map_groups(
        MergeApply,
        fn_constructor_kwargs={
            "table_dir": table_dir,
            "epoch": epoch,
            "partitions": man.partitions,
            "snapshot_schema_b64": schema_to_b64(snap_schema),
        },
        batch_format="pyarrow",
        concurrency=cfg.merge_concurrency,
        num_cpus=1,
    )
    stats = stats_ds.take_all()  # O(P) rows only

    # ---- commit point: rename all tmp parts, then atomic manifest swap ----
    seg_names = [s.name for s in segs]
    merged_rows = 0  # post-compaction change rows that reached the merge
    for row in stats:
        pid = str(row["pid"])
        final_rel = row["file"]
        tmp = os.path.join(table_dir, final_rel + ".tmp")
        os.replace(tmp, os.path.join(table_dir, final_rel))
        part = man.partitions[pid]
        part.update(
            {
                "watermark_lsn": epoch_max_lsn,
                "rows": int(row["rows"]),
                "bytes": int(row["bytes"]),
                "files": [final_rel],
            }
        )
        part["lineage"] = (part.get("lineage") or [])[-200:] + seg_names
        merged_rows += int(row["applied"])
    # Partitions with no changes this epoch advance their watermark too
    # (no event ≤ epoch_max_lsn can belong to them).
    for part in man.partitions.values():
        part["watermark_lsn"] = max(int(part["watermark_lsn"]), epoch_max_lsn)

    wall = time.perf_counter() - t0
    epoch_stats = {
        "epoch": epoch,
        "segments": len(segs),
        "events_applied": int(n_events),
        "merged_rows": int(merged_rows),
        "hot_pids": hot_pids,
        "rows_total": sum(int(p["rows"]) for p in man.partitions.values()),
        "wall_s": round(wall, 4),
        "events_per_s": round(n_events / wall, 1) if wall > 0 else 0.0,
    }
    man.epoch = epoch
    man.schema_b64 = schema_to_b64(snap_schema)
    man.history.append(epoch_stats)
    commit_manifest(man)
    if cfg.gc:
        gc_stale_files(man)
    return epoch_stats


def replay(table_dir: str, wal_dir: str, cfg: ApplyConfig | None = None) -> list[dict]:
    """Run epochs until the WAL is fully applied (resumable: picks up from the
    committed manifest watermark — the fix for the reference's restart-equals-
    full-resync behavior, /root/reference/etl/main.py:116-119)."""
    out = []
    while True:
        stats = apply_once(table_dir, wal_dir, cfg)
        if stats is None:
            return out
        out.append(stats)


def read_snapshot(table_dir: str) -> ray.data.Dataset:
    """The committed table as a Ray Dataset (MERGE-on-read already applied at
    write time: snapshots are clean — the fully-merged RMT state)."""
    man = load_manifest(table_dir)
    files = man.snapshot_files()
    if not files:
        return ray.data.from_arrow(man.schema.empty_table())
    return ray.data.read_parquet(files)


def snapshot_table(table_dir: str) -> pa.Table:
    """Driver-side snapshot materialization (tests / small tables only)."""
    man = load_manifest(table_dir)
    files = man.snapshot_files()
    if not files:
        return man.schema.empty_table()
    tables = [pq.read_table(f) for f in files]
    from ..schemas import cast_table

    tables = [cast_table(t, man.schema) for t in tables]
    return pa.concat_tables(tables).sort_by([("doc_id", "ascending")])
