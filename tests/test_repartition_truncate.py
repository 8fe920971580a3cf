"""Table re-partitioning (ALTER-layout job) + WAL truncation (log retention).

Both are whole-table / whole-log maintenance ops a long-lived lake needs:
``pid = H(doc_id) % P`` pins P in the manifest, so changing it is an explicit
shuffle job; segments below the committed watermark are dead weight the
reference leaves to Kafka retention."""

import os

import pytest

from clickhouse_data_pipeline_ray.pipelines.apply import (
    ApplyConfig,
    apply_once,
    create_table,
    repartition_table,
    replay,
    snapshot_table,
)
from clickhouse_data_pipeline_ray.sources.gen import GenParams, generate_wal
from clickhouse_data_pipeline_ray.sources.wal import list_segments, truncate_wal
from clickhouse_data_pipeline_ray.state.manifest import load_manifest

from .helpers import assert_snapshots_equal, replay_oracle

PARAMS = GenParams(
    total_events=4_000, base_events=1_000, events_per_segment=500, seed=61,
    mix=(0.3, 0.55, 0.15), tok_min=4, tok_max=32,
)


@pytest.fixture(scope="module")
def wal(tmp_path_factory):
    wal_dir = str(tmp_path_factory.mktemp("wal_rt"))
    generate_wal(wal_dir, PARAMS)
    return wal_dir


def test_repartition_preserves_state_and_keeps_applying(ray_session, wal, tmp_path):
    table_dir = str(tmp_path / "t")
    create_table(table_dir, num_partitions=4)
    # apply only half the WAL, repartition mid-life, then keep applying
    cfg = ApplyConfig(max_segments=4, salt_factor=1)
    apply_once(table_dir, wal, cfg)
    before = snapshot_table(table_dir)

    stats = repartition_table(table_dir, 16)
    assert stats["repartitioned"] and stats["num_partitions"] == 16
    man = load_manifest(table_dir)
    assert man.num_partitions == 16
    assert snapshot_table(table_dir).equals(before)
    # on-disk files = union over RETAINED manifests (old layout survives
    # while its epoch is retained for time travel; nothing else does)
    from clickhouse_data_pipeline_ray.state.manifest import retained_epochs

    live = {f for p in man.partitions.values() for f in p["files"]}
    for ep in retained_epochs(table_dir):
        hist = load_manifest(table_dir, epoch=ep)
        live |= {f for p in hist.partitions.values() for f in p["files"]}
    on_disk = {
        os.path.relpath(os.path.join(r, f), table_dir)
        for r, _d, fs in os.walk(os.path.join(table_dir, "parts"))
        for f in fs
    }
    assert on_disk == live

    replay(table_dir, wal, cfg)  # rest of the log under the new layout
    assert_snapshots_equal(snapshot_table(table_dir), replay_oracle(wal))


def test_repartition_same_p_is_noop(ray_session, wal, tmp_path):
    table_dir = str(tmp_path / "t")
    create_table(table_dir, num_partitions=4)
    replay(table_dir, wal, ApplyConfig(salt_factor=1))
    epoch = load_manifest(table_dir).epoch
    assert repartition_table(table_dir, 4) == {
        "repartitioned": False, "num_partitions": 4,
    }
    assert load_manifest(table_dir).epoch == epoch


def test_truncate_wal_drops_only_applied_segments(ray_session, wal, tmp_path):
    import shutil

    wal2 = str(tmp_path / "wal2")
    shutil.copytree(wal, wal2)
    table_dir = str(tmp_path / "t")
    create_table(table_dir, num_partitions=4)
    cfg = ApplyConfig(max_segments=3, salt_factor=1)
    apply_once(table_dir, wal2, cfg)  # 3 segments applied -> watermark 1500
    wm = load_manifest(table_dir).watermark
    removed = truncate_wal(wal2, wm)
    assert len(removed) == 3
    assert all(s.first_lsn > wm for s in list_segments(wal2))
    # a partially-applied boundary is kept: truncate at mid-segment watermark
    removed2 = truncate_wal(wal2, wm + 100)
    assert removed2 == []
    # replay continues from the truncated WAL and converges to the oracle
    replay(table_dir, wal2, cfg)
    assert_snapshots_equal(snapshot_table(table_dir), replay_oracle(wal))
