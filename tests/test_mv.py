"""Incremental materialized views (the SummingMergeTree MV analog,
/root/reference/etl/clickhouse_schema/kpi_views.sql): per-tick O(changes)
maintenance must agree bit-for-bit with a full recompute at every step."""

import duckdb
import pytest

from clickhouse_data_pipeline_ray.pipelines.apply import (
    ApplyConfig,
    apply_once,
    create_table,
    replay,
)
from clickhouse_data_pipeline_ray.pipelines.mv import (
    list_mvs,
    load_mv,
    read_mv,
    refresh_mv,
    register_mv,
)
from clickhouse_data_pipeline_ray.schemas import FACT_SNAPSHOT_SCHEMA
from clickhouse_data_pipeline_ray.sources.gen import FactGenParams, generate_fact_wal
from clickhouse_data_pipeline_ray.sources.wal import truncate_wal

MV_SUMS = [{"col": "value", "scale": 1000, "name": "sum_value_milli"}]


def _make(tmp_path, n_events=4_000):
    wal = str(tmp_path / "wal")
    generate_fact_wal(
        wal, FactGenParams(total_events=n_events, events_per_segment=500)
    )
    table = str(tmp_path / "t")
    create_table(
        table, schema=FACT_SNAPSHOT_SCHEMA, mode="append",
        key_col="event_id", num_partitions=4,
    )
    return table, wal


def _oracle(wal, upto_lsn):
    return duckdb.sql(
        f"""
        SELECT strftime(event_ts, '%Y-%m-%d') AS event_date, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT)
                   AS sum_value_milli
        FROM read_parquet('{wal}/seg-*.parquet')
        WHERE lsn <= {upto_lsn}
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()


def _mv_df(table):
    df = read_mv(table, "daily").to_pandas()
    return df[["event_date", "event_type", "n_events", "sum_value_milli"]]


def test_incremental_equals_full_recompute_every_tick(ray_session, tmp_path):
    table, wal = _make(tmp_path)
    register_mv(
        table, "daily", group_keys=["event_date", "event_type"],
        sums=MV_SUMS, date_from="event_ts",
    )
    cfg = ApplyConfig(max_segments=2)
    ticks = 0
    while True:
        stats = apply_once(table, wal, cfg)
        if stats is None:
            break
        tick = refresh_mv(table, wal, "daily")
        assert tick is not None and tick["to_lsn"] > tick["from_lsn"]
        got = _mv_df(table)
        want = _oracle(wal, tick["to_lsn"])
        assert got.values.tolist() == want.values.tolist(), f"tick {ticks}"
        ticks += 1
    assert ticks >= 4  # genuinely incremental, not one big fold


def test_refresh_caught_up_is_noop(ray_session, tmp_path):
    table, wal = _make(tmp_path, n_events=1_000)
    register_mv(
        table, "daily", group_keys=["event_date", "event_type"],
        sums=MV_SUMS, date_from="event_ts",
    )
    replay(table, wal, ApplyConfig(), final_compact=False)
    assert refresh_mv(table, wal, "daily") is not None
    before = load_mv(table, "daily")
    assert refresh_mv(table, wal, "daily") is None
    assert load_mv(table, "daily")["state_file"] == before["state_file"]


def test_lagging_mv_catches_up_in_one_tick(ray_session, tmp_path):
    """MV registered late / refreshed rarely: one tick folds several epochs."""
    table, wal = _make(tmp_path, n_events=2_000)
    replay(table, wal, ApplyConfig(max_segments=1), final_compact=False)
    register_mv(
        table, "daily", group_keys=["event_date", "event_type"],
        sums=MV_SUMS, date_from="event_ts",
    )
    tick = refresh_mv(table, wal, "daily")
    assert (tick["from_lsn"], tick["to_lsn"]) == (0, 2_000)
    assert _mv_df(table).values.tolist() == _oracle(wal, 2_000).values.tolist()


def test_upsert_table_rejected(ray_session, tmp_path):
    table = str(tmp_path / "t")
    create_table(table, num_partitions=4)  # default upsert/docs
    with pytest.raises(ValueError, match="append-mode"):
        register_mv(table, "daily", group_keys=["source"], sums=[])


def test_reregistration_rules(ray_session, tmp_path):
    table, _ = _make(tmp_path, n_events=500)
    spec = register_mv(
        table, "daily", group_keys=["event_date", "event_type"],
        sums=MV_SUMS, date_from="event_ts",
    )
    # identical re-registration: idempotent
    again = register_mv(
        table, "daily", group_keys=["event_date", "event_type"],
        sums=MV_SUMS, date_from="event_ts",
    )
    assert again["group_keys"] == spec["group_keys"]
    # conflicting definition: loud
    with pytest.raises(ValueError, match="different definition"):
        register_mv(table, "daily", group_keys=["event_type"], sums=MV_SUMS)
    # unknown columns: loud
    with pytest.raises(ValueError, match="not in table schema"):
        register_mv(table, "bad", group_keys=["nope"], sums=[])
    assert list_mvs(table) == ["daily"]


def test_truncated_wal_gap_detected(ray_session, tmp_path):
    table, wal = _make(tmp_path, n_events=2_000)
    register_mv(
        table, "daily", group_keys=["event_date", "event_type"],
        sums=MV_SUMS, date_from="event_ts",
    )
    replay(table, wal, ApplyConfig(), final_compact=False)
    truncate_wal(wal, 2_000)  # table is durable; the lagging MV is not
    with pytest.raises(ValueError, match="truncated past the MV watermark"):
        refresh_mv(table, wal, "daily")
