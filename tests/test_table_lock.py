"""Single-writer guard: concurrent epoch commits on one table are rejected
while the owner lives; a crashed owner's flock is released by the kernel the
instant it dies (safe under the exactly-once protocol — the dead run's tmp
files are GC'd). The lock file itself persists — unlink+recreate would let
two processes flock different inodes at the same path."""

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


def test_crashed_owner_lock_is_released(ray_session, tmp_path):
    wal = str(tmp_path / "wal")
    generate_wal(wal, PARAMS)
    table_dir = str(tmp_path / "t")
    create_table(table_dir, num_partitions=2)
    # a process that takes the flock and dies without releasing it: the
    # kernel drops the lock with the fd, so the next writer acquires at once
    subprocess.run(
        [
            sys.executable,
            "-c",
            "import fcntl, os; "
            "fd = os.open(os.path.join(r'%s', 'table.lock'), os.O_CREAT | os.O_RDWR); "
            "fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB); "
            "os.write(fd, str(os.getpid()).encode())" % table_dir,
        ],
        check=True,
    )
    assert os.path.exists(os.path.join(table_dir, "table.lock"))
    assert apply_once(table_dir, wal, ApplyConfig(salt_factor=1)) is not None
    while apply_once(table_dir, wal, ApplyConfig(salt_factor=1)):
        pass
    assert_snapshots_equal(snapshot_table(table_dir), replay_oracle(wal))


def test_lock_is_real_across_processes(ray_session, tmp_path):
    """A live flock in ANOTHER process rejects this one (the previous
    pid-file scheme had same-process blind spots; flock is fd-owned)."""
    table_dir = str(tmp_path / "t")
    create_table(table_dir, num_partitions=2)
    holder = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import fcntl, os, sys, time; "
            "fd = os.open(os.path.join(r'%s', 'table.lock'), os.O_CREAT | os.O_RDWR); "
            "fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB); "
            "print('held', flush=True); "
            "time.sleep(30)" % table_dir,
        ],
        stdout=subprocess.PIPE,
        text=True,
    )
    try:
        assert holder.stdout.readline().strip() == "held"
        with pytest.raises(TableLockError):
            with table_lock(table_dir):
                pass
    finally:
        holder.kill()
        holder.wait()
    # owner killed -> immediately acquirable
    with table_lock(table_dir):
        pass
