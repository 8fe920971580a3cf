"""Append-only fact tables: time partitioning, idempotence, pruned reads.

Mirrors the reference's fact_impressions/fact_clicks discipline
(/root/reference/etl/clickhouse_schema/init.sql:32-52: MergeTree append-only,
PARTITION BY toYYYYMM) on the Ray engine's manifest/commit machinery.
"""

import datetime as dt
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clickhouse_data_pipeline_ray.pipelines.apply import (
    ApplyConfig,
    apply_once,
    compact_table,
    create_table,
    files_for_time_range,
    read_time_range,
    replay,
    snapshot_table,
)
from clickhouse_data_pipeline_ray.schemas import FACT_SNAPSHOT_SCHEMA
from clickhouse_data_pipeline_ray.sources.gen import FactGenParams, generate_fact_wal
from clickhouse_data_pipeline_ray.state.manifest import load_manifest

TIME_SPEC = {"kind": "time", "col": "event_ts", "granularity": "month"}


def _make_table(tmp_path, n_events=4_000):
    wal = str(tmp_path / "wal")
    generate_fact_wal(wal, FactGenParams(total_events=n_events, events_per_segment=1_000))
    table = str(tmp_path / "t")
    create_table(
        table, schema=FACT_SNAPSHOT_SCHEMA, mode="append",
        key_col="event_id", partition_spec=TIME_SPEC,
    )
    return table, wal


def test_append_replay_matches_wal(ray_session, tmp_path):
    table, wal = _make_table(tmp_path)
    replay(table, wal, ApplyConfig(), final_compact=False)
    snap = snapshot_table(table)
    want = duckdb.sql(
        f"SELECT * FROM read_parquet('{wal}/seg-*.parquet') ORDER BY lsn"
    ).arrow()
    assert snap.num_rows == want.num_rows == 4_000
    assert snap.column("event_id").to_pylist() == want.column("event_id").to_pylist()
    assert snap.column("value").to_pylist() == want.column("value").to_pylist()
    # every row retained — append mode never deduplicates
    assert len(set(snap.column("lsn").to_pylist())) == 4_000


def test_time_partition_layout_and_dynamic_manifest(ray_session, tmp_path):
    table, wal = _make_table(tmp_path)
    replay(table, wal, ApplyConfig(), final_compact=False)
    man = load_manifest(table)
    # ~3 months of events from 2024-01-01 -> pids 202401..202404
    pids = sorted(int(p) for p in man.partitions)
    assert pids[0] == 202401 and len(pids) in (3, 4)
    for pid in pids:
        assert 202401 <= pid <= 202404
    # partition dirs on disk match the yyyymm ids
    dirs = sorted(os.listdir(os.path.join(table, "parts")))
    assert dirs == [f"pid={pid:05d}" for pid in pids]


def test_append_idempotent_and_resumable(ray_session, tmp_path):
    table, wal = _make_table(tmp_path)
    s1 = apply_once(table, wal, ApplyConfig(max_segments=2))
    assert s1["events_applied"] == 2_000
    # re-apply with no new segments beyond watermark: continues then stops
    replay(table, wal, ApplyConfig(max_segments=2), final_compact=False)
    assert apply_once(table, wal, ApplyConfig()) is None  # caught up
    snap = snapshot_table(table)
    assert snap.num_rows == 4_000  # no duplicates from re-application


def test_append_rejects_updates_and_deletes(ray_session, tmp_path):
    table, _ = _make_table(tmp_path)
    bad_wal = str(tmp_path / "badwal")
    os.makedirs(bad_wal)
    bad = pa.table(
        {
            "lsn": pa.array([1, 2], pa.int64()),
            "op": pa.array(["c", "u"], pa.string()),
            "event_id": pa.array(["a", "a"], pa.string()),
            "doc_id": pa.array(["d", "d"], pa.string()),
            "event_ts": pa.array([dt.datetime(2024, 1, 1)] * 2, pa.timestamp("us")),
            "event_type": pa.array(["view", "view"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    pq.write_table(bad, os.path.join(bad_wal, "seg-000000000001-000000000002.parquet"))
    with pytest.raises(Exception, match="invalid op"):
        apply_once(table, bad_wal, ApplyConfig())


def test_time_range_read_prunes_partitions(ray_session, tmp_path):
    table, wal = _make_table(tmp_path)
    replay(table, wal, ApplyConfig(), final_compact=False)
    start, end = dt.datetime(2024, 2, 1), dt.datetime(2024, 3, 1)
    chains = files_for_time_range(table, start, end)
    # pruning proof: only February's partition chain is listed
    assert sorted(chains) == ["202402"]
    got = read_time_range(table, start, end).to_pandas()
    want = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{wal}/seg-*.parquet')
            WHERE event_ts >= TIMESTAMP '2024-02-01' AND event_ts < TIMESTAMP '2024-03-01'"""
    ).fetchone()[0]
    assert len(got) == want > 0
    assert got["event_ts"].min() >= start and got["event_ts"].max() < end


def test_append_compaction_coalesces_chains(ray_session, tmp_path):
    table, wal = _make_table(tmp_path)
    # one epoch per segment -> 4-file chains per touched partition
    while apply_once(table, wal, ApplyConfig(max_segments=1)) is not None:
        pass
    man = load_manifest(table)
    assert any(len(p["files"]) > 1 for p in man.partitions.values())
    before = snapshot_table(table)
    stats = compact_table(table)
    assert stats is not None and stats["partitions_compacted"] >= 1
    man2 = load_manifest(table)
    assert all(len(p["files"]) == 1 for p in man2.partitions.values())
    after = snapshot_table(table)
    assert before.sort_by([("lsn", "ascending")]).equals(
        after.sort_by([("lsn", "ascending")])
    )


def test_null_event_ts_fails_loudly(ray_session, tmp_path):
    """A fact event with a null partition timestamp must fail the epoch
    with a clear error at assignment time, not a cryptic format crash in
    the merge actor pool."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from clickhouse_data_pipeline_ray.schemas import (
        FACT_CHANGE_SCHEMA,
        FACT_SNAPSHOT_SCHEMA,
    )
    from clickhouse_data_pipeline_ray.sources.wal import segment_path

    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    t = pa.table(
        {
            "lsn": pa.array([1, 2], pa.int64()),
            "op": pa.array(["c", "c"]),
            "event_id": pa.array(["e1", "e2"]),
            "doc_id": pa.array(["d1", "d2"]),
            "event_ts": pa.array([1_700_000_000_000_000, None], pa.timestamp("us")),
            "event_type": pa.array(["view", "view"]),
            "value": pa.array([1.0, 2.0], pa.float64()),
        },
        schema=FACT_CHANGE_SCHEMA,
    )
    pq.write_table(t, segment_path(wal, 1, 2))
    table = str(tmp_path / "t")
    create_table(
        table, schema=FACT_SNAPSHOT_SCHEMA, mode="append", key_col="event_id",
        partition_spec={"kind": "time", "col": "event_ts", "granularity": "month"},
    )
    with pytest.raises(Exception, match="null partition timestamp"):
        apply_once(table, wal, ApplyConfig())
