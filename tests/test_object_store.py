"""Object-store commit protocol: the multi-node / S3-GCS story.

The posix protocol (tmp+fsync+os.replace parts, flock single-writer) is
correct on one node but object stores have NO atomic rename and NO advisory
locks. `init_table(store="object")` switches the table to the
conditional-put protocol (state/store.py): parts PUT directly at final
deterministic keys, the commit point is a put-if-absent of the immutable
versioned manifest, the `manifest.json` pointer is non-authoritative, and
concurrency is optimistic (racing writers both run; exactly one wins the
conditional put; losers raise ConcurrentCommitError).

These tests mirror test_exactly_once / test_compaction_crash over the object
backend, pin that the protocol never calls os.replace or flock, and prove
the two-writer race has exactly one loser.
"""

import json
import os

import pytest

import clickhouse_data_pipeline_ray.pipelines.apply as apply_mod
from clickhouse_data_pipeline_ray.pipelines.apply import (
    ApplyConfig,
    apply_once,
    compact_table,
    create_table,
    replay,
    snapshot_table,
)
from clickhouse_data_pipeline_ray.sources.gen import GenParams, generate_wal
from clickhouse_data_pipeline_ray.state.manifest import (
    ConcurrentCommitError,
    commit_manifest,
    gc_stale_files,
    load_manifest,
    retained_epochs,
)
from clickhouse_data_pipeline_ray.state.store import store_kind

from .helpers import assert_snapshots_equal, replay_oracle

PARAMS = GenParams(
    total_events=4_000, base_events=1_000, events_per_segment=1_000, seed=31,
    tok_min=4, tok_max=32,
)
CFG = ApplyConfig(max_segments=2, salt_factor=1)
# distributed path (Ray merge workers) — the protocol must hold there too
DIST_CFG = ApplyConfig(max_segments=2, salt_factor=1, small_epoch_events=0)


@pytest.fixture(scope="module")
def wal(tmp_path_factory):
    wal_dir = str(tmp_path_factory.mktemp("wal_obj"))
    generate_wal(wal_dir, PARAMS)
    return wal_dir


def _no_tmps(table_dir):
    stray = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(os.path.join(table_dir, "parts"))
        for f in fs
        if ".tmp" in f or ".staged." in f
    ]
    assert not stray, stray


def test_object_replay_matches_oracle(ray_session, wal, tmp_path):
    table = str(tmp_path / "t")
    create_table(table, num_partitions=4, store="object")
    assert store_kind(table) == "object"
    replay(table, wal, DIST_CFG)
    assert_snapshots_equal(snapshot_table(table), replay_oracle(wal))
    _no_tmps(table)
    # no flock lock file was ever created (object mode skips the lock)
    assert not os.path.exists(os.path.join(table, "table.lock"))
    # idempotent re-apply
    assert apply_once(table, wal, ApplyConfig()) is None


def test_object_protocol_never_renames_or_locks(ray_session, wal, tmp_path, monkeypatch):
    """The whole epoch — part writes, manifest commit, GC — must complete
    with os.replace and fcntl.flock FORBIDDEN (driver-side micro-epoch path,
    where every part write and the commit run in this process)."""
    import fcntl

    table = str(tmp_path / "t")
    create_table(table, num_partitions=4, store="object")

    def no_replace(src, dst):
        raise AssertionError(f"os.replace({src}, {dst}) in object mode")

    def no_flock(fd, op):
        raise AssertionError("flock in object mode")

    monkeypatch.setattr(os, "replace", no_replace)
    monkeypatch.setattr(fcntl, "flock", no_flock)
    stats = apply_once(table, wal, CFG)  # micro-epoch driver fast path
    assert stats is not None and stats["events_applied"] == 2_000
    monkeypatch.undo()
    assert_snapshots_equal(
        snapshot_table(table), replay_oracle(wal, upto_lsn=2_000)
    )


def test_object_crash_before_commit_is_invisible_and_recoverable(
    ray_session, wal, tmp_path, monkeypatch
):
    table = str(tmp_path / "t")
    create_table(table, num_partitions=4, store="object")
    assert apply_once(table, wal, CFG) is not None  # epoch 1

    real_commit = apply_mod.commit_manifest

    def boom(man):
        raise RuntimeError("simulated crash before manifest commit")

    monkeypatch.setattr(apply_mod, "commit_manifest", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        apply_once(table, wal, CFG)
    monkeypatch.setattr(apply_mod, "commit_manifest", real_commit)

    # crashed epoch invisible: parts were PUT at final keys but no manifest
    # references them
    man = load_manifest(table)
    assert man.epoch == 1
    assert_snapshots_equal(
        snapshot_table(table), replay_oracle(wal, upto_lsn=2_000)
    )
    # recovery: re-run converges (re-PUTs identical bytes at the same keys)
    replay(table, wal, CFG)
    assert_snapshots_equal(snapshot_table(table), replay_oracle(wal))


def test_object_two_writer_race_exactly_one_loser(ray_session, wal, tmp_path):
    """Two writers read the same table state and race to commit the next
    epoch: the conditional put lets exactly one win; the loser gets
    ConcurrentCommitError, re-reads, and finds the work already done."""
    table = str(tmp_path / "t")
    create_table(table, num_partitions=4, store="object")
    apply_once(table, wal, CFG)

    man_a = load_manifest(table)
    man_b = load_manifest(table)  # second writer's independent view
    assert man_a.epoch == man_b.epoch == 1
    man_a.epoch = 2
    man_b.epoch = 2
    commit_manifest(man_a)  # writer A wins
    with pytest.raises(ConcurrentCommitError, match="already exists"):
        commit_manifest(man_b)  # writer B loses, loudly
    # loser retry path: fresh read sees A's commit; a caught-up apply no-ops
    assert load_manifest(table).epoch == 2
    assert apply_once(table, wal, ApplyConfig(max_segments=2)) is not None  # segs 3-4
    assert_snapshots_equal(snapshot_table(table), replay_oracle(wal))


def test_object_pointer_loss_resolves_by_listing(ray_session, wal, tmp_path):
    """manifest.json is a pointer, not the truth: a crash between the
    versioned commit PUT and the pointer PUT (simulated by deleting the
    pointer) must leave the table fully readable and writable."""
    table = str(tmp_path / "t")
    create_table(table, num_partitions=4, store="object")
    apply_once(table, wal, CFG)
    os.remove(os.path.join(table, "manifest.json"))

    man = load_manifest(table)  # resolved by LISTing versions
    assert man.epoch == 1
    assert_snapshots_equal(
        snapshot_table(table), replay_oracle(wal, upto_lsn=2_000)
    )
    # idempotent re-create doesn't reset the table either
    again = create_table(table, num_partitions=4, store="object")
    assert again.epoch == 1
    # and the next commit restores the pointer
    apply_once(table, wal, CFG)
    with open(os.path.join(table, "manifest.json")) as f:
        assert json.load(f)["epoch"] == 2


def test_object_compaction_crash_and_gc_grace(ray_session, wal, tmp_path, monkeypatch):
    table = str(tmp_path / "t")
    create_table(table, num_partitions=4, store="object")
    replay(table, wal,
           ApplyConfig(max_segments=1, salt_factor=1, compact_threshold=100,
                       write_mode="delta", small_epoch_events=0),
           final_compact=False)
    before_snap = snapshot_table(table)
    before_epoch = load_manifest(table).epoch

    real_commit = apply_mod.commit_manifest

    def boom(man):
        raise RuntimeError("injected crash during compaction commit")

    monkeypatch.setattr(apply_mod, "commit_manifest", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_table(table)
    monkeypatch.setattr(apply_mod, "commit_manifest", real_commit)

    # committed state untouched; the orphaned snapshot parts are invisible
    assert load_manifest(table).epoch == before_epoch
    assert snapshot_table(table).equals(before_snap)

    # GC grace: a racing writer's uncommitted parts must survive young...
    man = load_manifest(table)
    assert gc_stale_files(man, min_age_s=3600) == 0
    # ...but a maintenance GC past the grace window removes them
    assert gc_stale_files(man, min_age_s=0) > 0
    assert snapshot_table(table).equals(before_snap)

    # recovery: clean re-run compacts and preserves state
    stats = compact_table(table)
    assert stats["partitions_compacted"] > 0
    man = load_manifest(table)
    assert all(len(p["files"]) <= 1 for p in man.partitions.values())
    assert snapshot_table(table).equals(before_snap)
    _no_tmps(table)


def test_object_time_travel_still_works(ray_session, wal, tmp_path):
    table = str(tmp_path / "t")
    create_table(table, num_partitions=4, store="object")
    replay(table, wal, CFG, final_compact=False)
    eps = retained_epochs(table)
    assert len(eps) >= 2
    old = snapshot_table(table, epoch=eps[-2])
    cur = snapshot_table(table)
    assert old.num_rows != cur.num_rows or not old.equals(cur)
    assert_snapshots_equal(cur, replay_oracle(wal))


def test_object_two_process_concurrent_replay(tmp_path):
    """END-TO-END optimistic concurrency: two independent PROCESSES (no
    shared locks of any kind) replay the same WAL into one object-store
    table concurrently. Losers of the conditional manifest put retry from
    fresh state (replay's ConcurrentCommitError path); every segment must
    be applied exactly once and the final state must equal the oracle."""
    import subprocess
    import sys

    wal = str(tmp_path / "wal")
    generate_wal(
        wal,
        GenParams(total_events=4_000, base_events=1_000,
                  events_per_segment=500, seed=47, tok_min=4, tok_max=16),
    )
    table = str(tmp_path / "t")
    create_table(table, num_partitions=4, store="object")

    # micro-epochs ride the driver-side path (no Ray session needed in the
    # workers), one segment per epoch so the two writers interleave a lot
    script = (
        "import sys; sys.path.insert(0, %r);"
        "from clickhouse_data_pipeline_ray.pipelines.apply import ApplyConfig, replay;"
        "replay(%r, %r, ApplyConfig(max_segments=1, salt_factor=1), final_compact=False)"
    ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))), table, wal)
    procs = [
        subprocess.Popen([sys.executable, "-c", script],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for _ in range(2)
    ]
    for p in procs:
        _out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]

    man = load_manifest(table)
    assert man.watermark == 4_000
    # epochs strictly increasing, each segment in exactly one epoch lineage
    eps = [h["epoch"] for h in man.history]
    assert eps == sorted(set(eps))
    lineage = [s for p_ in man.partitions.values() for s in p_["lineage"]]
    from collections import Counter

    per_seg = Counter(lineage)
    # every partition records each segment exactly once
    assert all(c == len(man.partitions) for c in per_seg.values()), per_seg
    assert_snapshots_equal(snapshot_table(table), replay_oracle(wal))


def test_object_maintenance_ops(ray_session, tmp_path):
    """Mutations, TTL, size-tiered compaction, and fsck all run through the
    object-store commit protocol (conditional-put swaps, no renames)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from clickhouse_data_pipeline_ray.pipelines.apply import (
        compact_table,
        mutate_table,
        ttl_expire,
    )
    from clickhouse_data_pipeline_ray.schemas import FACT_SNAPSHOT_SCHEMA
    from clickhouse_data_pipeline_ray.sources.gen import (
        FactGenParams,
        generate_fact_wal,
    )
    from clickhouse_data_pipeline_ray.state.fsck import fsck_table

    wal = str(tmp_path / "fw")
    generate_fact_wal(wal, FactGenParams(total_events=3_000,
                                         events_per_segment=1_000, seed=19))
    table = str(tmp_path / "t")
    create_table(table, num_partitions=4, schema=FACT_SNAPSHOT_SCHEMA,
                 mode="append", key_col="event_id", store="object")
    replay(table, wal, ApplyConfig(max_segments=1, salt_factor=1),
           final_compact=False)
    base = load_manifest(table).total_rows()
    assert base == 3_000

    m = mutate_table(table, "value", lo=0.0, hi=20.0, delete=True)
    assert m is not None and m["rows_deleted"] > 0
    t = ttl_expire(table, "event_ts", dt.datetime(2024, 1, 10))
    assert t is not None and t["rows_expired"] > 0
    c = compact_table(table, size_ratio=0.0)
    assert c is None or c["partitions_compacted"] >= 0
    # state agrees with a relational recompute over the WAL
    import duckdb

    want = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{wal}/seg-*.parquet') "
        "WHERE NOT (value >= 0.0 AND value <= 20.0) "
        "AND event_ts >= TIMESTAMP '2024-01-10'"
    ).fetchone()[0]
    assert load_manifest(table).total_rows() == want
    res = fsck_table(table)
    assert res["ok"], res["findings"]
    _no_tmps(table)


def test_object_repartition(ray_session, wal, tmp_path):
    from clickhouse_data_pipeline_ray.pipelines.apply import repartition_table

    table = str(tmp_path / "t")
    create_table(table, num_partitions=4, store="object")
    replay(table, wal, CFG)
    before = snapshot_table(table)
    stats = repartition_table(table, 8)
    assert stats["num_partitions"] == 8
    man = load_manifest(table)
    assert len(man.partitions) == 8
    after = snapshot_table(table)
    assert after.sort_by("doc_id").equals(before.sort_by("doc_id"))
    _no_tmps(table)
    # applies keep working against the new layout
    assert apply_once(table, wal, ApplyConfig()) is None
