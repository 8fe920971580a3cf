"""Point lookups: correctness vs the full snapshot, partition-level pruning,
tombstone/delta-chain handling, and time travel."""

import pytest

from clickhouse_data_pipeline_ray.pipelines.apply import (
    ApplyConfig,
    create_table,
    replay,
    snapshot_table,
)
from clickhouse_data_pipeline_ray.pipelines import lookup as L
from clickhouse_data_pipeline_ray.sources.gen import GenParams, generate_wal


def _table(tmp_path, write_mode="delta", final_compact=False):
    wal = str(tmp_path / "wal")
    generate_wal(
        wal,
        GenParams(
            total_events=4_000, base_events=1_000, events_per_segment=1_000,
            mix=(0.3, 0.55, 0.15), tok_min=8, tok_max=32,
        ),
    )
    table = str(tmp_path / "t")
    create_table(table, num_partitions=8)
    replay(
        table, wal,
        ApplyConfig(max_segments=1, write_mode=write_mode),
        final_compact=final_compact,
    )
    return table


@pytest.mark.parametrize("write_mode,compact", [("delta", False), ("snapshot", True)])
def test_lookup_matches_snapshot(ray_session, tmp_path, write_mode, compact):
    """Mid-delta-chain AND compacted layouts must serve identical lookups."""
    table = _table(tmp_path, write_mode, compact)
    snap = snapshot_table(table).to_pandas().set_index("doc_id")
    live = list(snap.index[:5]) + list(snap.index[-5:])
    got = L.lookup_keys(table, live + ["nope-123"]).to_pandas()
    assert sorted(got["doc_id"]) == sorted(live)  # absent key ⇒ absent row
    for _, row in got.iterrows():
        want = snap.loc[row["doc_id"]]
        assert row["lsn"] == want["lsn"] and row["n_tok"] == want["n_tok"]


def test_deleted_key_not_served(ray_session, tmp_path):
    import duckdb

    table = _table(tmp_path)
    wal = str(tmp_path / "wal")
    deleted = duckdb.sql(
        f"""SELECT doc_id FROM read_parquet('{wal}/seg-*.parquet')
            GROUP BY doc_id HAVING arg_max(op, lsn) = 'd' LIMIT 3"""
    ).df()["doc_id"].tolist()
    assert deleted
    assert L.lookup_keys(table, deleted).num_rows == 0


def test_only_routed_partitions_opened(ray_session, tmp_path, monkeypatch):
    table = _table(tmp_path)
    snap = snapshot_table(table).to_pandas()
    key = snap["doc_id"].iloc[0]
    opened = []
    real = L.pq.read_table

    def spy(path, **kw):
        opened.append(path)
        return real(path, **kw)

    monkeypatch.setattr(L.pq, "read_table", spy)
    L.lookup_keys(table, [key])
    from clickhouse_data_pipeline_ray.stages.partition import partition_of

    pid = partition_of(key, 8)
    assert opened and all(f"pid={pid:05d}" in p for p in opened)


def test_lookup_time_travel(ray_session, tmp_path):
    table = _table(tmp_path)
    from clickhouse_data_pipeline_ray.state.manifest import load_manifest

    man = load_manifest(table)
    old = snapshot_table(table, epoch=1).to_pandas()
    cur = snapshot_table(table).to_pandas()
    changed = sorted(
        set(old["doc_id"]) & set(cur["doc_id"])
    )
    # pick a key whose version changed between epoch 1 and now
    om = old.set_index("doc_id")["lsn"]
    cm = cur.set_index("doc_id")["lsn"]
    moved = [k for k in changed if om[k] != cm[k]]
    assert moved and man.epoch > 1
    k = moved[0]
    assert L.lookup_keys(table, [k], epoch=1)["lsn"][0].as_py() == om[k]
    assert L.lookup_keys(table, [k])["lsn"][0].as_py() == cm[k]


def test_wrong_table_kinds_rejected(ray_session, tmp_path):
    from clickhouse_data_pipeline_ray.schemas import FACT_SNAPSHOT_SCHEMA

    t1 = str(tmp_path / "facts")
    create_table(
        t1, schema=FACT_SNAPSHOT_SCHEMA, mode="append",
        key_col="event_id", num_partitions=4,
    )
    with pytest.raises(ValueError, match="append"):
        L.lookup_keys(t1, ["ev-1"])
    t2 = str(tmp_path / "time")
    create_table(
        t2, schema=FACT_SNAPSHOT_SCHEMA, mode="upsert",
        partition_spec={"kind": "time", "col": "event_ts", "granularity": "month"},
    )
    with pytest.raises(ValueError, match="time-partitioned"):
        L.lookup_keys(t2, ["d-1"])
