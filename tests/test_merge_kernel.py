"""Unit tests for the pure-Arrow LWW merge kernel (no Ray).

Pins the semantics of ReplacingMergeTree(updated_at) ORDER BY key
(/root/reference/etl/clickhouse_schema/init.sql:14) plus proper tombstone
deletes (unimplemented in the reference,
/root/reference/stream_etl/core/processor.py:214-217).
"""

import pyarrow as pa
import pytest

from clickhouse_data_pipeline_ray.schemas import SNAPSHOT_SCHEMA
from clickhouse_data_pipeline_ray.stages.merge import (
    lww_compact,
    merge_base_and_changes,
)


def changes_table(rows):
    """rows: list of (lsn, op, doc_id, tokens)"""
    return pa.table(
        {
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows], pa.string()),
            "doc_id": pa.array([r[2] for r in rows], pa.string()),
            "tokens": pa.array([r[3] for r in rows], pa.list_(pa.int32())),
            "n_tok": pa.array(
                [len(r[3]) if r[3] is not None else None for r in rows], pa.int32()
            ),
            "source": pa.array(
                ["web" if r[3] is not None else None for r in rows], pa.string()
            ),
        }
    )


def snap(rows):
    """rows: list of (lsn, doc_id, tokens)"""
    return pa.table(
        {
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "doc_id": pa.array([r[1] for r in rows], pa.string()),
            "tokens": pa.array([r[2] for r in rows], pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[2]) for r in rows], pa.int32()),
            "source": pa.array(["web"] * len(rows), pa.string()),
        },
        schema=SNAPSHOT_SCHEMA,
    )


def result_dict(table):
    return {
        row["doc_id"]: (row["lsn"], row["tokens"]) for row in table.to_pylist()
    }


def test_insert_only():
    ch = changes_table([(1, "c", "a", [1]), (2, "c", "b", [2, 2])])
    out = merge_base_and_changes(None, ch, SNAPSHOT_SCHEMA)
    assert result_dict(out) == {"a": (1, [1]), "b": (2, [2, 2])}


def test_update_wins_by_lsn_any_order():
    for rows in (
        [(1, "c", "a", [1]), (5, "u", "a", [9])],
        [(5, "u", "a", [9]), (1, "c", "a", [1])],
    ):
        out = merge_base_and_changes(None, changes_table(rows), SNAPSHOT_SCHEMA)
        assert result_dict(out) == {"a": (5, [9])}


def test_late_low_lsn_event_loses():
    base = snap([(10, "a", [7])])
    ch = changes_table([(3, "u", "a", [1])])  # late arrival of an older write
    out = merge_base_and_changes(base, ch, SNAPSHOT_SCHEMA)
    assert result_dict(out) == {"a": (10, [7])}


def test_delete_tombstone():
    base = snap([(1, "a", [1]), (2, "b", [2])])
    ch = changes_table([(9, "d", "a", None)])
    out = merge_base_and_changes(base, ch, SNAPSHOT_SCHEMA)
    assert result_dict(out) == {"b": (2, [2])}


def test_update_after_delete_resurrects():
    ch = changes_table([(1, "c", "a", [1]), (2, "d", "a", None), (3, "u", "a", [5])])
    out = merge_base_and_changes(None, ch, SNAPSHOT_SCHEMA)
    assert result_dict(out) == {"a": (3, [5])}


def test_delete_wins_when_last():
    ch = changes_table([(1, "c", "a", [1]), (3, "u", "a", [5]), (9, "d", "a", None)])
    out = merge_base_and_changes(None, ch, SNAPSHOT_SCHEMA)
    assert result_dict(out) == {}


def test_equal_lsn_change_beats_base_row():
    # Re-applying the same write (crash replay) must be a no-op, not arbitrary
    # like RMT's tie-break.
    base = snap([(5, "a", [3])])
    ch = changes_table([(5, "u", "a", [3])])
    out = merge_base_and_changes(base, ch, SNAPSHOT_SCHEMA)
    assert result_dict(out) == {"a": (5, [3])}


def test_duplicate_lsn_replay_idempotent():
    ch = changes_table([(1, "c", "a", [1]), (2, "u", "a", [4])])
    once = merge_base_and_changes(None, ch, SNAPSHOT_SCHEMA)
    twice = merge_base_and_changes(once, ch, SNAPSHOT_SCHEMA)
    assert once.equals(twice)


def test_compaction_associative():
    # LWW(a ∪ b) == LWW(LWW(a) ∪ LWW(b)) — the property salting relies on.
    a = changes_table([(1, "c", "x", [1]), (4, "u", "x", [4]), (2, "c", "y", [2])])
    b = changes_table([(3, "u", "y", [3]), (6, "d", "x", None), (5, "u", "x", [5])])
    whole = lww_compact(pa.concat_tables([a, b]))
    split = lww_compact(pa.concat_tables([lww_compact(a), lww_compact(b)]))
    assert whole.sort_by("doc_id").equals(split.sort_by("doc_id"))
    # tombstone retained by compaction, applied by merge
    out = merge_base_and_changes(None, pa.concat_tables([a, b]), SNAPSHOT_SCHEMA)
    assert result_dict(out) == {"y": (3, [3])}


def test_output_sorted_and_schema_conformant():
    ch = changes_table([(2, "c", "b", [2]), (1, "c", "a", [1]), (3, "c", "c", [3])])
    out = merge_base_and_changes(None, ch, SNAPSHOT_SCHEMA)
    assert out.schema.equals(SNAPSHOT_SCHEMA)


def test_schema_evolution_cast():
    # base lacks lang; changes carry it; unified target has both + widened n_tok
    target = pa.schema(
        [
            pa.field("lsn", pa.int64()),
            pa.field("doc_id", pa.string()),
            pa.field("tokens", pa.list_(pa.int32())),
            pa.field("n_tok", pa.int64()),
            pa.field("source", pa.string()),
            pa.field("lang", pa.string()),
        ]
    )
    base = snap([(1, "a", [1])])
    ch = changes_table([(2, "c", "b", [2])]).append_column(
        "lang", pa.array(["en"], pa.string())
    )
    out = merge_base_and_changes(base, ch, target)
    assert out.schema.equals(target)
    got = {r["doc_id"]: r["lang"] for r in out.to_pylist()}
    assert got == {"a": None, "b": "en"}


def test_long_delta_chain_rank_over_127():
    # regression: _src rank was int8; a 130-file chain overflowed fill_null
    from clickhouse_data_pipeline_ray.stages.merge import merge_file_tables

    tables = [changes_table([(i + 1, "u", "k", [i])]) for i in range(130)]
    out = merge_file_tables(tables, SNAPSHOT_SCHEMA)
    assert out.num_rows == 1
    assert out.column("tokens").to_pylist() == [[129]]


def test_lww_compact_null_keys_are_one_group():
    """Null keys must not poison adjacent runs: ``not_equal`` is null against
    a null side (→ False as a mask bit), which silently dropped the last
    real key's winner next to the null run and kept a null-key row. Nulls
    now compare as one ordinary key group."""
    import pyarrow as pa

    from clickhouse_data_pipeline_ray.stages.merge import lww_compact

    t = pa.table(
        {
            "doc_id": pa.array(["a", None, None, "b", "a"]),
            "lsn": pa.array([1, 5, 6, 3, 2], pa.int64()),
        }
    )
    out = lww_compact(t)
    got = set(zip(out.column("doc_id").to_pylist(), out.column("lsn").to_pylist()))
    assert got == {("a", 2), ("b", 3), (None, 6)}
    # all-null degenerate
    t2 = pa.table(
        {
            "doc_id": pa.array([None, None], pa.string()),
            "lsn": pa.array([1, 2], pa.int64()),
        }
    )
    assert lww_compact(t2).to_pydict() == {"doc_id": [None], "lsn": [2]}


def test_normalize_rejects_null_keys():
    """A change event with a null key (e.g. a JSONL segment missing the
    field — cast_table null-fills it) fails the epoch loudly, like invalid
    ops do, instead of reaching the LWW merge."""
    import pyarrow as pa
    import pytest

    from clickhouse_data_pipeline_ray.schemas import CHANGE_SCHEMA
    from clickhouse_data_pipeline_ray.stages.normalize import make_normalize_fn

    fn = make_normalize_fn(CHANGE_SCHEMA, {"kind": "hash", "num": 4})
    batch = pa.table(
        {
            "lsn": pa.array([1, 2], pa.int64()),
            "op": pa.array(["c", "c"]),
            "doc_id": pa.array(["a", None]),
            "tokens": pa.array([[1], [2]], pa.list_(pa.int32())),
        }
    )
    with pytest.raises(ValueError, match="null"):
        fn(batch)
