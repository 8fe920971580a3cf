"""Streaming tail semantics (the Kafka-consumer analog,
/root/reference/stream_etl/core/consumer.py:86-109): a live WAL grows between
apply cycles; each cycle must pick up exactly the new segments past the
committed watermark and converge to the full-log oracle. The generator is
prefix-stable (segment i is a pure function of (seed, i)), so extending
total_events appends segments without rewriting history."""

from dataclasses import replace

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

BASE = GenParams(
    total_events=3_000, base_events=1_000, events_per_segment=500, seed=7,
    mix=(0.3, 0.55, 0.15), tok_min=4, tok_max=32,
)


def test_tail_picks_up_only_new_segments(ray_session, tmp_path):
    wal = str(tmp_path / "wal")
    generate_wal(wal, BASE)
    table_dir = str(tmp_path / "t")
    create_table(table_dir, num_partitions=4)
    cfg = ApplyConfig(salt_factor=1)
    replay(table_dir, wal, cfg, final_compact=False)
    wm1 = load_manifest(table_dir).watermark
    assert wm1 == BASE.total_events

    # the producer appends 2k more events (prefix-stable extension)
    generate_wal(wal, replace(BASE, total_events=5_000))
    stats = apply_once(table_dir, wal, cfg)
    assert stats["events_applied"] == 2_000, "tail must apply only the delta"
    assert load_manifest(table_dir).watermark == 5_000
    assert apply_once(table_dir, wal, cfg) is None  # caught up again

    assert_snapshots_equal(
        snapshot_table(table_dir),
        replay_oracle(wal),
    )


def test_extension_is_prefix_stable(tmp_path):
    import glob
    import hashlib

    w1, w2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    generate_wal(w1, BASE)
    generate_wal(w2, replace(BASE, total_events=5_000))
    for p1 in sorted(glob.glob(w1 + "/*.parquet")):
        p2 = p1.replace(w1, w2)
        h1 = hashlib.sha256(open(p1, "rb").read()).hexdigest()
        h2 = hashlib.sha256(open(p2, "rb").read()).hexdigest()
        assert h1 == h2, f"segment rewritten on extension: {p1}"
