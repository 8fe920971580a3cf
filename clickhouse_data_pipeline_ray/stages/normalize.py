"""Normalize stage: the vectorized analog of the reference's transformers.

The reference normalizes row-by-row in Python — null-coalescing timestamps
(/root/reference/etl/core/pipeline.py:57-68), casting decimal strings
(pipeline.py:70-87), deriving ``event_date`` (pipeline.py:89-104), and
defensively parsing scalars (/root/reference/stream_etl/core/processor.py:41-141).
Here all of that is one zero-copy Arrow ``map_batches`` stage:

- op normalization: Debezium snapshot-read ``r`` → ``c``
  (processor.py:196-198 treats them identically), unknown ops rejected;
- schema unification: cast each batch to the epoch's unified change schema
  (missing columns → typed nulls, int widen) — the engine's schema-evolution
  path, replacing per-value parsing;
- derived-column recompute: ``n_tok = len(tokens)`` invariant (mirror of the
  derived ``event_date``, pipeline.py:94-95);
- partition assignment (pid/salt routing columns);
- per-batch LWW pre-compaction (combiner before the shuffle).
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import cast_table
from .merge import lww_compact
from .partition import assign_partitions

_VALID_OPS = ("c", "u", "d")


def normalize_batch(batch: pa.Table, change_schema: pa.Schema) -> pa.Table:
    """Normalize one Arrow batch of change events to the unified schema."""
    op = batch.column("op")
    op = pc.if_else(pc.equal(op, pa.scalar("r")), pa.scalar("c"), op)
    bad = pc.sum(pc.invert(pc.is_in(op, value_set=pa.array(_VALID_OPS))).cast(pa.int64()))
    if (bad.as_py() or 0) > 0:
        raise ValueError(f"unknown op codes in change batch: {pc.unique(op).to_pylist()}")

    batch = batch.drop_columns(["op"]) if "op" in batch.column_names else batch
    batch = cast_table(batch, change_schema.remove(change_schema.get_field_index("op")))

    # Recompute the n_tok invariant from the payload (null for tombstones).
    n_tok_type = change_schema.field("n_tok").type
    n_tok = pc.list_value_length(batch.column("tokens")).cast(n_tok_type)
    batch = batch.set_column(batch.schema.get_field_index("n_tok"), "n_tok", n_tok)
    return batch.append_column("op", op)


def make_normalize_fn(
    change_schema: pa.Schema,
    num_partitions: int,
    salt_factor: int = 1,
    watermark: int = 0,
    precompact: bool = True,
) -> Callable[[pa.Table], pa.Table]:
    """Build the map_batches function for one epoch (stateless tasks)."""

    def fn(batch: pa.Table) -> pa.Table:
        if watermark > 0:
            batch = batch.filter(pc.greater(batch.column("lsn"), pa.scalar(watermark)))
        if batch.num_rows == 0:
            empty = cast_table(batch, change_schema)
            return assign_partitions(empty, num_partitions, salt_factor)
        batch = normalize_batch(batch, change_schema)
        batch = assign_partitions(batch, num_partitions, salt_factor)
        if precompact:
            batch = lww_compact(batch)
        return batch

    return fn


def compact_group(group: pa.Table) -> pa.Table:
    """Pure LWW compaction of one (pid, salt) sub-group — stage 1 of the
    salted two-level merge. Keeps tombstones (they must reach the final
    merge); safe because every doc_id maps to exactly one (pid, salt)."""
    return lww_compact(group)
