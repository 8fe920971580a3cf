"""Compaction exactly-once: a crash mid-compaction must leave the committed
manifest (and therefore reads) untouched, and a re-run must converge — the
same tmp-write → rename-all → atomic-swap protocol as apply epochs."""

import os

import pytest

from clickhouse_data_pipeline_ray.pipelines.apply import (
    ApplyConfig,
    compact_table,
    create_table,
    replay,
    snapshot_table,
)
from clickhouse_data_pipeline_ray.sources.gen import GenParams, generate_wal
from clickhouse_data_pipeline_ray.state.manifest import load_manifest

PARAMS = GenParams(
    total_events=4_000, base_events=1_000, events_per_segment=500, seed=53,
    mix=(0.3, 0.55, 0.15), tok_min=4, tok_max=32,
)


@pytest.fixture(scope="module")
def wal(tmp_path_factory):
    wal_dir = str(tmp_path_factory.mktemp("wal_cc"))
    generate_wal(wal_dir, PARAMS)
    return wal_dir


def test_crash_mid_compaction_is_invisible(ray_session, wal, tmp_path, monkeypatch):
    table_dir = str(tmp_path / "t")
    create_table(table_dir, num_partitions=4)
    replay(table_dir, wal,
           ApplyConfig(max_segments=1, salt_factor=1, compact_threshold=100),
           final_compact=False)
    before_snap = snapshot_table(table_dir)
    before_man = open(os.path.join(table_dir, "manifest.json")).read()

    # Crash injection: the driver dies after the workers wrote their tmp
    # files but before any rename — simulated by failing the rename step.
    import clickhouse_data_pipeline_ray.pipelines.apply as apply_mod

    real_replace = os.replace
    calls = {"n": 0}

    def failing_replace(src, dst):
        calls["n"] += 1
        raise OSError("injected crash during compaction commit")

    monkeypatch.setattr(apply_mod.os, "replace", failing_replace)
    with pytest.raises(OSError, match="injected crash"):
        compact_table(table_dir)
    monkeypatch.setattr(apply_mod.os, "replace", real_replace)
    assert calls["n"] == 1

    # Committed state is untouched: same manifest bytes, same reads.
    assert open(os.path.join(table_dir, "manifest.json")).read() == before_man
    assert snapshot_table(table_dir).equals(before_snap)

    # Recovery: a clean re-run compacts everything and preserves state.
    stats = compact_table(table_dir)
    assert stats["partitions_compacted"] > 0
    man = load_manifest(table_dir)
    assert all(len(p["files"]) <= 1 for p in man.partitions.values())
    assert snapshot_table(table_dir).equals(before_snap)
    # leftover tmp files from the crashed run were GC'd at commit
    stray = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(os.path.join(table_dir, "parts"))
        for f in fs
        if ".tmp" in f
    ]
    assert not stray, stray
