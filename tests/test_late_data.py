"""Event-time watermark + late-data accounting (§2.9 streaming concerns).

The LSN watermark tracks processing-time progress; tables with an
``event_time_col`` additionally track an EVENT-time high-water mark per
epoch and count arrivals whose event time is behind it (the Flink
watermark/allowed-lateness idea applied to micro-batch epochs — the metric
the reference's streaming consumer never surfaces,
/root/reference/stream_etl/core/consumer.py:95-105).
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from clickhouse_data_pipeline_ray.pipelines.apply import (
    ApplyConfig,
    apply_once,
    create_table,
    replay,
)
from clickhouse_data_pipeline_ray.schemas import FACT_CHANGE_SCHEMA, FACT_SNAPSHOT_SCHEMA
from clickhouse_data_pipeline_ray.sources.gen import FactGenParams, generate_fact_wal
from clickhouse_data_pipeline_ray.sources.wal import segment_path
from clickhouse_data_pipeline_ray.state.manifest import load_manifest

US = 1_000_000


def _write_segment(wal_dir, first_lsn, ts_seconds):
    n = len(ts_seconds)
    lsn = np.arange(first_lsn, first_lsn + n, dtype=np.int64)
    t = pa.table(
        {
            "lsn": pa.array(lsn),
            "op": pa.array(["c"] * n, pa.string()),
            "event_id": pa.array([f"ev-{x:012d}" for x in lsn], pa.string()),
            "doc_id": pa.array([f"web-{x % 7:08d}" for x in lsn], pa.string()),
            "event_ts": pa.array(
                [int(s) * US for s in ts_seconds], pa.timestamp("us")
            ),
            "event_type": pa.array(["view"] * n, pa.string()),
            "value": pa.array([1.0] * n, pa.float64()),
        },
        schema=FACT_CHANGE_SCHEMA,
    )
    pq.write_table(t, segment_path(wal_dir, first_lsn, first_lsn + n - 1))
    return first_lsn + n


def _make_table(tmp_path, lateness=0.0):
    wal = str(tmp_path / "wal")
    import os

    os.makedirs(wal, exist_ok=True)
    table = str(tmp_path / "t")
    create_table(
        table, schema=FACT_SNAPSHOT_SCHEMA, mode="append",
        key_col="event_id", event_time_col="event_ts", num_partitions=4,
    )
    cfg = ApplyConfig(max_segments=1, allowed_lateness_s=lateness)
    return table, wal, cfg


def test_late_events_counted_per_epoch(ray_session, tmp_path):
    table, wal, cfg = _make_table(tmp_path)
    nxt = _write_segment(wal, 1, [100, 200, 300])
    nxt = _write_segment(wal, nxt, [250, 400])  # 250 < 300 → 1 late
    _write_segment(wal, nxt, [50, 500])         # 50 < 400 → 1 late

    s1 = apply_once(table, wal, cfg)
    assert s1["late_events"] == 0  # no prior watermark: nothing can be late
    assert s1["event_time_watermark_us"] == 300 * US

    s2 = apply_once(table, wal, cfg)
    assert s2["late_events"] == 1
    assert s2["event_time_watermark_us"] == 400 * US

    s3 = apply_once(table, wal, cfg)
    assert s3["late_events"] == 1
    assert s3["event_time_watermark_us"] == 500 * US

    man = load_manifest(table)
    assert man.event_time_watermark_us == 500 * US
    assert [h.get("late_events") for h in man.history[:3]] == [0, 1, 1]


def test_allowed_lateness_tolerates_small_disorder(ray_session, tmp_path):
    table, wal, cfg = _make_table(tmp_path, lateness=60.0)
    nxt = _write_segment(wal, 1, [100, 200, 300])
    _write_segment(wal, nxt, [250, 60, 400])  # 250 within 60s of 300; 60 not

    apply_once(table, wal, cfg)
    s2 = apply_once(table, wal, cfg)
    assert s2["late_events"] == 1


def test_watermark_monotone_under_all_late_epoch(ray_session, tmp_path):
    """An epoch of only-late events must not move the watermark backwards."""
    table, wal, cfg = _make_table(tmp_path)
    nxt = _write_segment(wal, 1, [1000])
    _write_segment(wal, nxt, [10, 20])

    apply_once(table, wal, cfg)
    s2 = apply_once(table, wal, cfg)
    assert s2["late_events"] == 2
    assert s2["event_time_watermark_us"] == 1000 * US


def test_disabled_without_event_time_col(ray_session, tmp_path):
    wal = str(tmp_path / "wal")
    generate_fact_wal(wal, FactGenParams(total_events=1_000, events_per_segment=500))
    table = str(tmp_path / "t")
    create_table(
        table, schema=FACT_SNAPSHOT_SCHEMA, mode="append",
        key_col="event_id", num_partitions=4,
    )
    stats = replay(table, wal, ApplyConfig(), final_compact=False)
    assert all("late_events" not in s for s in stats)
    assert load_manifest(table).event_time_watermark_us is None


def test_generator_late_frac_produces_late_events(ray_session, tmp_path):
    wal = str(tmp_path / "wal")
    generate_fact_wal(
        wal,
        FactGenParams(
            total_events=2_000, events_per_segment=500,
            late_frac=0.1, late_by_s=24 * 3600,
        ),
    )
    table = str(tmp_path / "t")
    create_table(
        table, schema=FACT_SNAPSHOT_SCHEMA, mode="append",
        key_col="event_id", event_time_col="event_ts", num_partitions=4,
    )
    stats = replay(table, wal, ApplyConfig(max_segments=1), final_compact=False)
    assert sum(s.get("late_events", 0) for s in stats) > 0
    # ~3 months span / 2000 events ≈ 1h4m per step: a 24h shift crosses many
    # epoch boundaries, but the watermark still ends at the unshifted max.
    man = load_manifest(table)
    assert man.event_time_watermark_us is not None
