"""Single-writer guard: concurrent epoch commits on one table are rejected
while the owner lives; a crashed owner's stale lock is reclaimed (safe under
the exactly-once protocol — the dead run's tmp files are GC'd)."""

import os
import subprocess
import sys

import pytest

from clickhouse_data_pipeline_ray.pipelines.apply import (
    ApplyConfig,
    apply_once,
    create_table,
    snapshot_table,
)
from clickhouse_data_pipeline_ray.sources.gen import GenParams, generate_wal
from clickhouse_data_pipeline_ray.state.manifest import TableLockError, table_lock

from .helpers import assert_snapshots_equal, replay_oracle

PARAMS = GenParams(
    total_events=2_000, base_events=500, events_per_segment=500, seed=71,
    tok_min=4, tok_max=16,
)


def test_second_writer_rejected_while_lock_held(ray_session, tmp_path):
    wal = str(tmp_path / "wal")
    generate_wal(wal, PARAMS)
    table_dir = str(tmp_path / "t")
    create_table(table_dir, num_partitions=2)
    with table_lock(table_dir):
        with pytest.raises(TableLockError):
            apply_once(table_dir, wal, ApplyConfig(salt_factor=1))
    # lock released -> apply proceeds
    assert apply_once(table_dir, wal, ApplyConfig(salt_factor=1)) is not None


def test_stale_lock_from_dead_process_is_reclaimed(ray_session, tmp_path):
    wal = str(tmp_path / "wal")
    generate_wal(wal, PARAMS)
    table_dir = str(tmp_path / "t")
    create_table(table_dir, num_partitions=2)
    # a process that takes the lock and dies without releasing it
    proc = subprocess.run(
        [sys.executable, "-c", "import os; open(os.path.join(r'%s', 'table.lock'), 'x').write(str(os.getpid()))" % table_dir],
        check=True,
    )
    assert os.path.exists(os.path.join(table_dir, "table.lock"))
    # owner pid is dead -> reclaimed, apply succeeds
    assert apply_once(table_dir, wal, ApplyConfig(salt_factor=1)) is not None
    while apply_once(table_dir, wal, ApplyConfig(salt_factor=1)):
        pass
    assert_snapshots_equal(snapshot_table(table_dir), replay_oracle(wal))
    assert not os.path.exists(os.path.join(table_dir, "table.lock"))
