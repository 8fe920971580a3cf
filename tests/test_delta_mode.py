"""Delta write mode (MERGE-on-read): correctness + scale-shape invariants.

The scale path of the engine: epochs append O(changes) per-partition delta
files instead of rewriting O(table) snapshots (the write-time analog of
ReplacingMergeTree's deferred merge, /root/reference/etl/clickhouse_schema/
init.sql:14-15); readers reconstruct state per partition; compaction folds a
chain back to one clean file. All three views must agree with the dict-replay
oracle and with snapshot (MERGE-on-write) mode.
"""

import os

import pytest

from clickhouse_data_pipeline_ray.pipelines.apply import (
    ApplyConfig,
    compact_table,
    create_table,
    read_snapshot,
    replay,
    snapshot_table,
)
from clickhouse_data_pipeline_ray.sources.gen import GenParams, generate_wal
from clickhouse_data_pipeline_ray.state.manifest import load_manifest

from .helpers import assert_snapshots_equal, replay_oracle

PARAMS = GenParams(
    total_events=6_000, base_events=1_500, events_per_segment=1_000, seed=23,
    mix=(0.3, 0.55, 0.15), tok_min=4, tok_max=32,
)


@pytest.fixture(scope="module")
def wal(tmp_path_factory):
    wal_dir = str(tmp_path_factory.mktemp("wal_delta"))
    generate_wal(wal_dir, PARAMS)
    return wal_dir


def _delta_cfg(**kw):
    base = dict(max_segments=1, salt_factor=1, write_mode="delta",
                compact_threshold=100)  # high threshold: no auto-compaction
    base.update(kw)
    return ApplyConfig(**base)


def test_pending_deltas_read_matches_oracle(ray_session, wal, tmp_path):
    """Merge-on-read over an uncompacted chain (1 epoch per segment = deep
    chain) equals the oracle, both driver-side and as a Dataset."""
    table_dir = str(tmp_path / "t")
    create_table(table_dir, num_partitions=4)
    replay(table_dir, wal, _delta_cfg(), final_compact=False)
    man = load_manifest(table_dir)
    chains = [len(p["files"]) for p in man.partitions.values()]
    assert max(chains) > 1, "expected uncompacted delta chains"
    oracle = replay_oracle(wal)
    assert_snapshots_equal(snapshot_table(table_dir), oracle)
    ds_table = (
        read_snapshot(table_dir)
        .to_arrow_refs()
    )
    import pyarrow as pa
    import ray as _ray

    got = pa.concat_tables([_ray.get(r) for r in ds_table]).sort_by(
        [("doc_id", "ascending")]
    )
    assert_snapshots_equal(got, oracle)


def test_delta_equals_snapshot_mode(ray_session, wal, tmp_path):
    t_delta, t_snap = str(tmp_path / "d"), str(tmp_path / "s")
    create_table(t_delta, num_partitions=4)
    create_table(t_snap, num_partitions=4)
    replay(t_delta, wal, _delta_cfg())
    replay(t_snap, wal, ApplyConfig(salt_factor=1, write_mode="snapshot"),
           final_compact=False)
    assert snapshot_table(t_delta).equals(snapshot_table(t_snap))


def test_compaction_is_state_preserving_and_idempotent(ray_session, wal, tmp_path):
    table_dir = str(tmp_path / "t")
    create_table(table_dir, num_partitions=4)
    replay(table_dir, wal, _delta_cfg(), final_compact=False)
    before = snapshot_table(table_dir)
    stats = compact_table(table_dir)
    assert stats["partitions_compacted"] > 0
    man = load_manifest(table_dir)
    assert all(len(p["files"]) <= 1 for p in man.partitions.values())
    assert all(p.get("exact_rows", True) for p in man.partitions.values())
    assert snapshot_table(table_dir).equals(before)
    assert compact_table(table_dir) is None  # nothing dirty → no-op


def test_auto_compaction_bounds_chain_length(ray_session, wal, tmp_path):
    table_dir = str(tmp_path / "t")
    create_table(table_dir, num_partitions=4)
    replay(table_dir, wal, _delta_cfg(compact_threshold=3), final_compact=False)
    man = load_manifest(table_dir)
    assert max(len(p["files"]) for p in man.partitions.values()) < 3
    assert_snapshots_equal(snapshot_table(table_dir), replay_oracle(wal))


def test_delta_writes_are_o_changes_not_o_table(ray_session, wal, tmp_path):
    """Shape invariant for the 10^10 design point: a delta epoch's bytes on
    disk scale with the epoch's changes, not the accumulated table."""
    table_dir = str(tmp_path / "t")
    create_table(table_dir, num_partitions=4)
    replay(table_dir, wal, _delta_cfg(), final_compact=False)
    man = load_manifest(table_dir)
    sizes = []
    for p in man.partitions.values():
        for f in p["files"]:
            sizes.append((f, os.path.getsize(os.path.join(table_dir, f))))
    deltas = [s for f, s in sizes if "delta-" in os.path.basename(f)]
    bases = [s for f, s in sizes if "delta-" not in os.path.basename(f)]
    assert deltas, "no delta files written"
    # 6 epochs of ~1k events over a ~2k-row table: mean delta must be well
    # under the mean base/compacted size it would have been rewritten as.
    assert sum(deltas) / len(deltas) < sum(s for _, s in sizes) / len(sizes) * 2
