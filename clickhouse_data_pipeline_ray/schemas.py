"""Arrow schema constants + evolution helpers for the CDC engine.

The reference declares all schemas up front in SQL DDL
(/root/reference/seeder/migrations/V1__create_schema.sql,
/root/reference/etl/clickhouse_schema/init.sql). Here the analogs are explicit
``pyarrow.Schema`` constants; schema evolution (column add / type widen, the
role played by the reference's defensive scalar parsers at
/root/reference/stream_etl/core/processor.py:41-141) is handled by Arrow
schema unification + casting, not per-value parsing.
"""

from __future__ import annotations

import base64

import pyarrow as pa

# Base table of pre-tokenized training sequences (BASELINE.json input_hint).
BASE_FIELDS = [
    pa.field("doc_id", pa.string()),
    pa.field("tokens", pa.list_(pa.int32())),
    pa.field("n_tok", pa.int32()),
    pa.field("source", pa.string()),
]
BASE_SCHEMA = pa.schema(BASE_FIELDS)

# Change-event (WAL) schema: op codes follow Debezium ('c' insert, 'u' update,
# 'd' delete; 'r' snapshot-read is normalized to 'c'), mirroring the flattened
# Debezium messages the reference consumes
# (/root/reference/stream_etl/core/processor.py:186-217). ``lsn`` is a strict
# global total order (the role of Kafka offset + updated_at version).
CHANGE_SCHEMA = pa.schema(
    [pa.field("lsn", pa.int64()), pa.field("op", pa.string())] + BASE_FIELDS
)

# Committed snapshot rows keep the winning writer's LSN: it is the version for
# subsequent LWW merges (the role of ReplacingMergeTree's ``updated_at``
# version column, /root/reference/etl/clickhouse_schema/init.sql:14) and
# per-row lineage.
SNAPSHOT_SCHEMA = pa.schema([pa.field("lsn", pa.int64())] + BASE_FIELDS)

# Evolved variants used by tests/generator: column add (lang) + widen
# (n_tok int32 -> int64). See FIXTURES.md §3.
EVOLVED_BASE_FIELDS = [
    pa.field("doc_id", pa.string()),
    pa.field("tokens", pa.list_(pa.int32())),
    pa.field("n_tok", pa.int64()),
    pa.field("source", pa.string()),
    pa.field("lang", pa.string()),
]
EVOLVED_CHANGE_SCHEMA = pa.schema(
    [pa.field("lsn", pa.int64()), pa.field("op", pa.string())] + EVOLVED_BASE_FIELDS
)

# Append-only fact/event table (the analog of fact_impressions/fact_clicks,
# /root/reference/etl/clickhouse_schema/init.sql:32-52: MergeTree, PARTITION
# BY toYYYYMM, append-only — no versioned merge). Keyed by event_id; rows are
# immutable once written, so the only valid op is 'c'.
FACT_BASE_FIELDS = [
    pa.field("event_id", pa.string()),
    pa.field("doc_id", pa.string()),
    pa.field("event_ts", pa.timestamp("us")),
    pa.field("event_type", pa.string()),
    pa.field("value", pa.float64()),
]
FACT_CHANGE_SCHEMA = pa.schema(
    [pa.field("lsn", pa.int64()), pa.field("op", pa.string())] + FACT_BASE_FIELDS
)
FACT_SNAPSHOT_SCHEMA = pa.schema([pa.field("lsn", pa.int64())] + FACT_BASE_FIELDS)

OPS = ("c", "r", "u", "d")


def unify(schemas: list[pa.Schema]) -> pa.Schema:
    """Unify schemas permissively (column add + numeric widen).

    This is the engine's schema-evolution primitive: the unified schema of
    (current snapshot schema, all pending WAL segment schemas) becomes the
    epoch's target schema; every batch and the base partitions are cast to it.
    """
    return pa.unify_schemas(list(schemas), promote_options="permissive")


def snapshot_schema_of(change_schema: pa.Schema) -> pa.Schema:
    """Snapshot schema = change schema minus the ``op`` routing column."""
    idx = change_schema.get_field_index("op")
    return change_schema.remove(idx) if idx >= 0 else change_schema


def schema_to_b64(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode("ascii")


def schema_from_b64(data: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.py_buffer(base64.b64decode(data)))


def cast_table(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast ``table`` to ``target``: missing columns become typed nulls,
    present columns are cast (int widen etc.), column order normalized.

    Extra columns not in ``target`` are dropped (callers re-append transient
    columns like ``pid`` themselves).
    """
    n = table.num_rows
    cols = []
    for field in target:
        i = table.schema.get_field_index(field.name)
        if i < 0:
            cols.append(pa.nulls(n, type=field.type))
        else:
            col = table.column(i)
            cols.append(col if col.type == field.type else col.cast(field.type))
    return pa.Table.from_arrays(cols, schema=target)
