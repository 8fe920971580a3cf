"""Last-writer-wins merge: the correctness heart of the engine.

Re-realizes ``ReplacingMergeTree(updated_at) ORDER BY (key)`` semantics
(/root/reference/etl/clickhouse_schema/init.sql:14-15,28-29) as a vectorized
Arrow kernel: per key, the row with the maximum version (LSN) wins; a winning
delete op is a tombstone that removes the key (the reference receives delete
events but drops them, /root/reference/stream_etl/core/processor.py:214-217 —
here they are implemented per the north rule).

LWW is an associative, commutative, idempotent reduction (argmax by LSN per
key), so it can be applied hierarchically: per input batch (pre-compaction
before the shuffle), per (pid, salt) sub-group (skew salting), and finally per
partition against the base snapshot — all yielding the same result as one
global pass. Tests pin this (tests/test_merge_kernel.py, tests/test_salting.py).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schemas import cast_table, schema_from_b64

# Transient routing columns added by the partition stage.
ROUTING_COLS = ("pid", "salt")

# Tie-break rank: base-snapshot rows lose to change rows at equal LSN (an
# equal-LSN change is the same write replayed; preferring the change keeps
# re-apply bit-identical). The reference's RMT tie-break is arbitrary
# (init.sql:14); ours is deterministic.
_SRC_BASE = 0
_SRC_CHANGE = 1


def _last_wins_mask(keys: pa.Array) -> pa.Array:
    """Boolean mask selecting the last row of each equal-key run.

    ``keys`` must be sorted. Vectorized: row i wins iff keys[i] != keys[i+1].
    """
    n = len(keys)
    if n == 0:
        return pa.array([], type=pa.bool_())
    neq = pc.not_equal(keys.slice(0, n - 1), keys.slice(1, n - 1))
    mask = np.ones(n, dtype=bool)
    mask[: n - 1] = neq.to_numpy(zero_copy_only=False)
    return pa.array(mask)


def lww_compact(
    table: pa.Table,
    key: str = "doc_id",
    version: str = "lsn",
    src_rank: str | None = None,
) -> pa.Table:
    """Keep, per key, only the max-version row (tombstones retained as rows).

    Used as the per-batch pre-compaction combiner (shrinks update-heavy change
    streams *before* the shuffle — the partial-aggregation pattern) and as the
    per-(pid, salt) sub-group compactor for skew salting.
    """
    if table.num_rows == 0:
        return table
    sort_keys = [(key, "ascending"), (version, "ascending")]
    if src_rank is not None:
        sort_keys.append((src_rank, "ascending"))
    table = table.sort_by(sort_keys)
    mask = _last_wins_mask(table.column(key).combine_chunks())
    return table.filter(mask)


def merge_base_and_changes(
    base: pa.Table | None,
    changes: pa.Table,
    snapshot_schema: pa.Schema,
) -> pa.Table:
    """MERGE: base snapshot ⊔ change rows → new snapshot (tombstones dropped).

    ``base`` rows carry the LSN of their last writer (stored in the snapshot),
    so re-merging is a pure LWW reduction. ``changes`` must have an ``op``
    column; the result conforms to ``snapshot_schema`` (schema evolution:
    both sides are cast to it) and is sorted by key for deterministic output
    files (exactly-once re-runs produce identical bytes).
    """
    changes = changes.drop_columns([c for c in ROUTING_COLS if c in changes.column_names])
    op = changes.column("op")
    changes = cast_table(changes, snapshot_schema)
    changes = changes.append_column("op", op.cast(pa.string()))
    changes = changes.append_column(
        "_src", pa.nulls(changes.num_rows, pa.int8()).fill_null(_SRC_CHANGE)
    )

    if base is not None and base.num_rows > 0:
        base = cast_table(base, snapshot_schema)
        n = base.num_rows
        base = base.append_column("op", pa.nulls(n, pa.string()).fill_null("c"))
        base = base.append_column("_src", pa.nulls(n, pa.int8()).fill_null(_SRC_BASE))
        combined = pa.concat_tables([base, changes], promote_options="none")
    else:
        combined = changes

    winners = lww_compact(combined, src_rank="_src")
    alive = winners.filter(pc.not_equal(winners.column("op"), pa.scalar("d")))
    return cast_table(alive, snapshot_schema)  # drops op/_src, fixes order


class MergeApply:
    """Stateful merge worker: applies one partition's change group per call.

    Runs as an actor pool via
    ``grouped.map_groups(MergeApply, concurrency=(m, n), batch_format="pyarrow")``
    — the Ray Data analog of the reference's long-lived loader with its DB
    connection + watermark (/root/reference/etl/core/db.py:113-115,
    /root/reference/etl/core/pipeline.py:197-202). Per-partition state
    (base-file paths, watermarks, target schema) is resolved once in
    ``__init__``; each ``__call__`` handles one pid group.

    Output files are written as ``snapshot-{epoch}.parquet.tmp`` and renamed /
    committed by the driver only after *all* partitions succeed (exactly-once:
    a crashed epoch leaves no visible state; re-running rewrites the same
    deterministic bytes).
    """

    def __init__(
        self,
        table_dir: str,
        epoch: int,
        partitions: dict[str, dict],
        snapshot_schema_b64: str,
    ):
        self.table_dir = table_dir
        self.epoch = epoch
        self.partitions = partitions
        self.snapshot_schema = schema_from_b64(snapshot_schema_b64)

    def _read_base(self, meta: dict) -> pa.Table | None:
        files = meta.get("files") or []
        if not files:
            return None
        tables = [pq.read_table(os.path.join(self.table_dir, f)) for f in files]
        tables = [cast_table(t, self.snapshot_schema) for t in tables]
        return pa.concat_tables(tables) if len(tables) > 1 else tables[0]

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        pid = group.column("pid")[0].as_py()
        meta = self.partitions[str(pid)]
        watermark = int(meta["watermark_lsn"])

        # Idempotent re-apply: skip events at or below this partition's
        # committed watermark (the manifest is the single source of truth,
        # unlike the reference's in-memory last_sync, pipeline.py:197-202).
        changes = group.filter(pc.greater(group.column("lsn"), pa.scalar(watermark)))
        n_applied = changes.num_rows
        ops = changes.column("op")
        n_del = pc.sum(pc.equal(ops, pa.scalar("d")).cast(pa.int64())).as_py() or 0

        base = self._read_base(meta)
        merged = merge_base_and_changes(base, changes, self.snapshot_schema)
        merged = merged.sort_by([("doc_id", "ascending")])

        part_dir = os.path.join(self.table_dir, "parts", f"pid={pid:05d}")
        os.makedirs(part_dir, exist_ok=True)
        rel_final = os.path.join("parts", f"pid={pid:05d}", f"snapshot-{self.epoch:06d}.parquet")
        tmp_path = os.path.join(self.table_dir, rel_final + ".tmp")
        # Unique scratch name then atomic replace, so a retried task never
        # interleaves bytes with a concurrent writer of the same partition.
        scratch = f"{tmp_path}.{os.getpid()}"
        pq.write_table(merged, scratch, compression="zstd")
        os.replace(scratch, tmp_path)

        max_lsn = pc.max(changes.column("lsn")).as_py() if n_applied else watermark
        return pa.table(
            {
                "pid": pa.array([pid], pa.int32()),
                "rows": pa.array([merged.num_rows], pa.int64()),
                "bytes": pa.array([os.path.getsize(tmp_path)], pa.int64()),
                "applied": pa.array([n_applied], pa.int64()),
                "deletes": pa.array([n_del], pa.int64()),
                "max_lsn": pa.array([int(max_lsn or 0)], pa.int64()),
                "file": pa.array([rel_final], pa.string()),
                "merge_s": pa.array([time.perf_counter() - t0], pa.float64()),
            }
        )
