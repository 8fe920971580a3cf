"""Exactly-once / crash-recovery tests.

The reference is at-least-once: batch watermark is in-memory (restart = full
resync, duplicate facts — /root/reference/etl/core/pipeline.py:197-202,
/root/reference/etl/main.py:116-119) and the streaming path commits offsets
after processing (/root/reference/stream_etl/core/consumer.py:103-105).
This engine's commit protocol (write tmp parts → rename → atomic manifest
swap) must make replay of a crashed epoch idempotent and re-application a
no-op.
"""

import os

import pytest

import clickhouse_data_pipeline_ray.pipelines.apply as apply_mod
from clickhouse_data_pipeline_ray.pipelines.apply import (
    ApplyConfig,
    apply_once,
    create_table,
    replay,
    snapshot_table,
)
from clickhouse_data_pipeline_ray.sources.gen import GenParams, generate_wal
from clickhouse_data_pipeline_ray.state.manifest import load_manifest

from .helpers import assert_snapshots_equal, replay_oracle

PARAMS = GenParams(
    total_events=4_000, base_events=1_000, events_per_segment=1_000, seed=23,
    tok_min=4, tok_max=32,
)
# small_epoch_events=0: keep this suite pinned to the DISTRIBUTED apply path
# (the micro-epoch driver fast path has its own identity/idempotency test in
# test_replay_oracle.py and would otherwise absorb these tiny WALs)
CFG = ApplyConfig(max_segments=2, salt_factor=1, small_epoch_events=0)


@pytest.fixture(scope="module")
def wal(tmp_path_factory):
    wal_dir = str(tmp_path_factory.mktemp("wal"))
    generate_wal(wal_dir, PARAMS)
    return wal_dir


def test_crash_before_manifest_commit_is_invisible_and_recoverable(
    ray_session, wal, tmp_path, monkeypatch
):
    table_dir = str(tmp_path / "table")
    create_table(table_dir, num_partitions=4)
    assert apply_once(table_dir, wal, CFG) is not None  # epoch 1 committed

    # Crash injection: epoch 2 writes all its part files but dies before the
    # manifest swap.
    real_commit = apply_mod.commit_manifest

    def boom(man):
        raise RuntimeError("simulated crash before manifest commit")

    monkeypatch.setattr(apply_mod, "commit_manifest", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        apply_once(table_dir, wal, CFG)
    monkeypatch.setattr(apply_mod, "commit_manifest", real_commit)

    # The crashed epoch is invisible: manifest still at epoch 1.
    man = load_manifest(table_dir)
    assert man.epoch == 1
    assert_snapshots_equal(
        snapshot_table(table_dir), replay_oracle(wal, upto_lsn=2_000)
    )

    # Recovery: plain re-run converges to the oracle.
    replay(table_dir, wal, CFG)
    assert_snapshots_equal(snapshot_table(table_dir), replay_oracle(wal))


def test_reapply_same_log_is_noop(ray_session, wal, tmp_path):
    table_dir = str(tmp_path / "table")
    create_table(table_dir, num_partitions=4)
    replay(table_dir, wal, CFG)
    before = snapshot_table(table_dir)
    man_before = load_manifest(table_dir)
    assert apply_once(table_dir, wal, ApplyConfig()) is None
    assert snapshot_table(table_dir).equals(before)
    assert load_manifest(table_dir).epoch == man_before.epoch


def test_resume_from_manifest_after_restart(ray_session, wal, tmp_path):
    """Applying half the log, then 'restarting' (fresh driver state, same
    manifest) applies only the remainder — the fix for the reference's
    restart-equals-full-resync."""
    table_dir = str(tmp_path / "table")
    create_table(table_dir, num_partitions=4)
    apply_once(table_dir, wal, CFG)  # segments 1-2
    man = load_manifest(table_dir)
    assert man.watermark == 2_000
    stats = apply_once(table_dir, wal, CFG)  # resumes at watermark
    assert stats["events_applied"] == 2_000
    assert_snapshots_equal(snapshot_table(table_dir), replay_oracle(wal))


def test_gc_removes_stale_epochs_and_tmps(ray_session, wal, tmp_path):
    """GC contract with time travel: everything on disk is referenced by SOME
    retained manifest (current or historical); tmp files never survive."""
    from clickhouse_data_pipeline_ray.state.manifest import retained_epochs

    table_dir = str(tmp_path / "table")
    create_table(table_dir, num_partitions=4)
    replay(table_dir, wal, CFG)
    man = load_manifest(table_dir)
    live = set(man.snapshot_files())
    for ep in retained_epochs(table_dir):
        live |= set(load_manifest(table_dir, epoch=ep).snapshot_files())
    on_disk = set()
    for root, _d, names in os.walk(os.path.join(table_dir, "parts")):
        on_disk.update(os.path.join(root, n) for n in names)
    assert on_disk == live
    assert not [p for p in on_disk if ".tmp" in p]


def test_kpi_report_on_empty_table(ray_session, tmp_path):
    """kpi over a freshly initialized (zero-row) table returns zeros, not a
    raw KeyError from the columnless grouped aggregate; kpi over a table
    without the doc columns is rejected with an actionable error."""
    import pytest

    from clickhouse_data_pipeline_ray.pipelines.kpi import kpi_report
    from clickhouse_data_pipeline_ray.schemas import FACT_SNAPSHOT_SCHEMA

    t = str(tmp_path / "empty")
    create_table(t, num_partitions=4)
    rep = kpi_report(t)
    assert rep == {
        "totals": {"n_docs": 0, "sum_tok": 0, "max_lsn": 0},
        "per_source": [],
    }
    facts = str(tmp_path / "facts")
    create_table(
        facts, schema=FACT_SNAPSHOT_SCHEMA, mode="append", key_col="event_id",
        num_partitions=2,
    )
    with pytest.raises(ValueError, match="kpi needs"):
        kpi_report(facts)
