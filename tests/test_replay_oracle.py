"""End-to-end replay vs independent dict-replay oracle.

The analog of the reference's integration replay-convergence test
(/root/reference/tests/test_integration.py:78-106): full sync, then an
incremental cycle with no new data must apply zero events.
"""

import pytest

from clickhouse_data_pipeline_ray.pipelines.apply import (
    ApplyConfig,
    apply_once,
    create_table,
    replay,
    snapshot_table,
)
from clickhouse_data_pipeline_ray.sources.gen import GenParams, generate_wal

from .helpers import assert_snapshots_equal, replay_oracle

PARAMS = GenParams(
    total_events=5_000, base_events=1_000, events_per_segment=1_000, seed=11,
    tok_min=4, tok_max=32,
)


@pytest.fixture(scope="module")
def wal(tmp_path_factory):
    wal_dir = str(tmp_path_factory.mktemp("wal"))
    generate_wal(wal_dir, PARAMS)
    return wal_dir


def test_single_epoch_replay_matches_oracle(ray_session, wal, tmp_path):
    table_dir = str(tmp_path / "table")
    create_table(table_dir, num_partitions=8)
    stats = replay(table_dir, wal, ApplyConfig(salt_factor=1))
    applies = [s for s in stats if not s.get("compaction")]
    assert len(applies) == 1
    assert applies[0]["events_applied"] == PARAMS.total_events
    assert_snapshots_equal(snapshot_table(table_dir), replay_oracle(wal))


def test_multi_epoch_incremental_replay_matches_oracle(ray_session, wal, tmp_path):
    table_dir = str(tmp_path / "table")
    create_table(table_dir, num_partitions=8)
    stats = replay(table_dir, wal, ApplyConfig(max_segments=2, salt_factor=1))
    applies = [s for s in stats if not s.get("compaction")]
    assert len(applies) == 3  # 5 segments, 2 per epoch
    assert sum(s["events_applied"] for s in applies) == PARAMS.total_events
    assert_snapshots_equal(snapshot_table(table_dir), replay_oracle(wal))
    # incremental convergence: a further cycle applies nothing
    assert apply_once(table_dir, wal, ApplyConfig()) is None


def test_partition_count_invariance(ray_session, wal, tmp_path):
    t1, t2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    create_table(t1, num_partitions=2)
    create_table(t2, num_partitions=16)
    replay(t1, wal, ApplyConfig(salt_factor=1))
    replay(t2, wal, ApplyConfig(salt_factor=1))
    a, b = snapshot_table(t1), snapshot_table(t2)
    assert a.equals(b)


def test_snapshot_rows_carry_winning_lsn(ray_session, wal, tmp_path):
    table_dir = str(tmp_path / "table")
    create_table(table_dir, num_partitions=4)
    replay(table_dir, wal, ApplyConfig(salt_factor=1))
    snap = snapshot_table(table_dir)
    oracle = replay_oracle(wal)
    assert snap.column("lsn").to_pylist() == oracle.column("lsn").to_pylist()


def test_small_epoch_fast_path_equals_distributed(ray_session, wal, tmp_path):
    """The micro-epoch driver fast path and the distributed path must commit
    IDENTICAL table state (shared normalize + MergeApply kernels, shared
    commit protocol), and the fast path must stay idempotent and resumable
    (re-apply when caught up is a no-op)."""
    t_fast, t_dist = str(tmp_path / "fast"), str(tmp_path / "dist")
    create_table(t_fast, num_partitions=8)
    create_table(t_dist, num_partitions=8)
    # 1k-event segments, 1 per epoch: well under the fast-path threshold
    fast = replay(t_fast, wal, ApplyConfig(max_segments=1), final_compact=False)
    dist = replay(
        t_dist, wal,
        ApplyConfig(max_segments=1, small_epoch_events=0),
        final_compact=False,
    )
    assert len(fast) == len(dist) == 5
    assert [s["events_applied"] for s in fast] == [s["events_applied"] for s in dist]
    a, b = snapshot_table(t_fast), snapshot_table(t_dist)
    assert a.equals(b)
    assert_snapshots_equal(a, replay_oracle(wal))
    # idempotent convergence on the fast path
    assert apply_once(t_fast, wal, ApplyConfig()) is None
