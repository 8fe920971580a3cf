"""Dead-letter quarantine of malformed change events.

Contracts: with a DLQ configured, an epoch containing invalid-op / null-lsn
/ null-key rows COMMITS with exactly the well-formed rows applied (final
state equals replaying only the good rows) and quarantines exactly the bad
rows with correct reasons; without a DLQ the same WAL fails the epoch
loudly (the strict default is unchanged); a crash-retried epoch replaces —
never duplicates — its quarantined rows."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clickhouse_data_pipeline_ray.pipelines.apply import (
    ApplyConfig,
    apply_once,
    create_table,
    snapshot_table,
)
from clickhouse_data_pipeline_ray.sources.wal import segment_path


def _seg(wal, lsn0, rows):
    """rows: list of (lsn|None, op, doc_id|None, tokens)."""
    t = pa.table(
        {
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows], pa.string()),
            "doc_id": pa.array([r[2] for r in rows], pa.string()),
            "tokens": pa.array(
                [r[3] for r in rows], pa.list_(pa.int32())
            ),
            "n_tok": pa.array(
                [len(r[3]) if r[3] is not None else None for r in rows],
                pa.int32(),
            ),
            "source": pa.array(["web"] * len(rows), pa.string()),
        }
    )
    last = max(r[0] for r in rows if r[0] is not None)
    pq.write_table(t, segment_path(wal, lsn0, last))


GOOD = [
    (1, "c", "d1", [1, 2, 3]),
    (2, "c", "d2", [4, 5]),
    (4, "u", "d1", [9]),
]
BAD = [
    (3, "x", "d3", [7]),          # invalid_op
    (None, "c", "d4", [8]),       # null_lsn
    (5, "c", None, [6]),          # null_key
]


@pytest.fixture()
def dirs(ray_session, tmp_path):
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    _seg(wal, 1, GOOD + BAD)
    table = str(tmp_path / "t")
    create_table(table, num_partitions=4)
    return table, wal, str(tmp_path / "dlq")


@pytest.mark.parametrize("small_epoch", [0, 100])
def test_dlq_quarantines_and_commits_good_rows(ray_session, dirs, small_epoch):
    table, wal, dlq = dirs
    stats = apply_once(
        table, wal,
        ApplyConfig(salt_factor=1, dlq_dir=dlq, small_epoch_events=small_epoch),
    )
    assert stats["dlq_rows"] == 3
    snap = snapshot_table(table)
    state = {
        d: t
        for d, t in zip(
            snap.column("doc_id").to_pylist(),
            snap.column("tokens").to_pylist(),
        )
    }
    assert state == {"d1": [9], "d2": [4, 5]}
    edir = os.path.join(dlq, "epoch=1")
    bad = pa.concat_tables(
        pq.read_table(os.path.join(edir, f))
        for f in os.listdir(edir)
        if f.endswith(".parquet")
    )
    reasons = dict(
        zip(
            [d if d is not None else "<null>" for d in bad.column("doc_id").to_pylist()],
            bad.column("reason").to_pylist(),
        )
    )
    assert reasons == {
        "d3": "invalid_op",
        "d4": "null_lsn",
        "<null>": "null_key",
    }
    assert not any(f.endswith(".tmp") for f in os.listdir(edir))


def test_without_dlq_epoch_fails_loudly(ray_session, dirs):
    table, wal, _ = dirs
    with pytest.raises(Exception, match="invalid op|null"):
        apply_once(
            table, wal, ApplyConfig(salt_factor=1, small_epoch_events=100)
        )


def test_epoch_retry_replaces_quarantine(ray_session, dirs):
    table, wal, dlq = dirs
    cfg = ApplyConfig(salt_factor=1, dlq_dir=dlq, small_epoch_events=100)
    from clickhouse_data_pipeline_ray.pipelines.apply import _make_dlq_writer

    # simulate a crashed first attempt that already quarantined rows
    w = _make_dlq_writer(dlq, 1)
    w(pa.table({"doc_id": pa.array(["stale"]), "reason": pa.array(["invalid_op"])}))
    stats = apply_once(table, wal, cfg)
    assert stats["dlq_rows"] == 3  # the stale part was wiped, not added to
    edir = os.path.join(dlq, "epoch=1")
    all_ids = []
    for f in os.listdir(edir):
        if f.endswith(".parquet"):
            all_ids += pq.read_table(os.path.join(edir, f)).column(
                "doc_id"
            ).to_pylist()
    assert "stale" not in all_ids


def test_append_mode_quarantines_updates(ray_session, tmp_path):
    from clickhouse_data_pipeline_ray.schemas import FACT_SNAPSHOT_SCHEMA

    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    import datetime as dt

    ts = dt.datetime(2024, 3, 5, 12, 0, 0)
    t = pa.table(
        {
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "op": pa.array(["c", "u", "c"], pa.string()),  # u illegal in append
            "event_id": pa.array(["e1", "e2", "e3"], pa.string()),
            "doc_id": pa.array(["d1", "d2", "d3"], pa.string()),
            "event_ts": pa.array([ts] * 3, pa.timestamp("us")),
            "event_type": pa.array(["view"] * 3, pa.string()),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    pq.write_table(t, segment_path(wal, 1, 3))
    table = str(tmp_path / "t")
    create_table(
        table, num_partitions=2, mode="append", schema=FACT_SNAPSHOT_SCHEMA,
        key_col="event_id",
    )
    dlq = str(tmp_path / "dlq")
    stats = apply_once(
        table, wal,
        ApplyConfig(salt_factor=1, dlq_dir=dlq, small_epoch_events=0),
    )
    assert stats["dlq_rows"] == 1
    snap = snapshot_table(table)
    assert sorted(snap.column("event_id").to_pylist()) == ["e1", "e3"]


def test_dlq_writer_content_addressed(ray_session, tmp_path):
    """A retried task re-emitting the SAME bad batch overwrites its own
    part (sha1 content naming) instead of duplicating it."""
    from clickhouse_data_pipeline_ray.pipelines.apply import _make_dlq_writer

    w = _make_dlq_writer(str(tmp_path / "dlq"), 1)
    bad = pa.table({"doc_id": pa.array(["x"]), "reason": pa.array(["invalid_op"])})
    w(bad)
    w(bad)  # simulated task retry
    edir = str(tmp_path / "dlq" / "epoch=1")
    parts = [f for f in os.listdir(edir) if f.endswith(".parquet")]
    assert len(parts) == 1
    other = pa.table({"doc_id": pa.array(["y"]), "reason": pa.array(["null_lsn"])})
    w(other)
    assert len([f for f in os.listdir(edir) if f.endswith(".parquet")]) == 2


def test_split_malformed_missing_columns_quarantines_all(ray_session):
    from clickhouse_data_pipeline_ray.stages.normalize import split_malformed

    no_op = pa.table({"lsn": pa.array([1, 2], pa.int64()),
                      "doc_id": pa.array(["a", "b"])})
    good, bad = split_malformed(no_op, ("c", "u", "d"))
    assert good.num_rows == 0 and bad.num_rows == 2
    assert set(bad.column("reason").to_pylist()) == {"missing_op"}
    no_lsn = pa.table({"op": pa.array(["c", "c"]),
                       "doc_id": pa.array(["a", "b"])})
    good, bad = split_malformed(no_lsn, ("c", "u", "d"))
    assert good.num_rows == 0
    assert set(bad.column("reason").to_pylist()) == {"missing_lsn"}
