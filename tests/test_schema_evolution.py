"""Schema evolution: column add + int widen mid-log (FIXTURES.md §3).

The role played by the reference's defensive per-value parsers
(decimal-string widening at /root/reference/stream_etl/core/processor.py:41-68)
is handled here by Arrow schema unification in the apply stage.
"""

import pyarrow as pa
import pytest

from clickhouse_data_pipeline_ray.pipelines.apply import (
    ApplyConfig,
    create_table,
    replay,
    snapshot_table,
)
from clickhouse_data_pipeline_ray.sources.gen import GenParams, generate_wal
from clickhouse_data_pipeline_ray.state.manifest import load_manifest

from .helpers import assert_snapshots_equal, replay_oracle

PARAMS = GenParams(
    total_events=4_000, base_events=1_000, events_per_segment=500, seed=31,
    evolve_frac=0.5, tok_min=4, tok_max=32,
)


@pytest.fixture(scope="module")
def wal(tmp_path_factory):
    wal_dir = str(tmp_path_factory.mktemp("wal_evolve"))
    generate_wal(wal_dir, PARAMS)
    return wal_dir


def test_evolved_replay_matches_oracle(ray_session, wal, tmp_path):
    table_dir = str(tmp_path / "table")
    create_table(table_dir, num_partitions=4)
    replay(table_dir, wal, ApplyConfig(salt_factor=1))
    snap = snapshot_table(table_dir)
    assert_snapshots_equal(snap, replay_oracle(wal))


def test_final_schema_is_unified(ray_session, wal, tmp_path):
    table_dir = str(tmp_path / "table")
    create_table(table_dir, num_partitions=4)
    # Apply in many epochs so the schema change lands mid-run: pre-evolution
    # epochs commit the narrow schema, later epochs widen it.
    replay(table_dir, wal, ApplyConfig(max_segments=2, salt_factor=1))
    man = load_manifest(table_dir)
    schema = man.schema
    assert schema.field("lang").type == pa.string()
    assert schema.field("n_tok").type == pa.int64()
    snap = snapshot_table(table_dir)
    rows = snap.to_pylist()
    # rows last written pre-evolution have lang=null; post-evolution non-null
    assert any(r["lang"] is None for r in rows)
    assert any(r["lang"] is not None for r in rows)
    # n_tok invariant survives the widen
    for r in rows:
        assert r["n_tok"] == len(r["tokens"])


def test_epoch_boundary_vs_single_epoch_equal(ray_session, wal, tmp_path):
    t1, t2 = str(tmp_path / "a"), str(tmp_path / "b")
    create_table(t1, num_partitions=4)
    create_table(t2, num_partitions=4)
    replay(t1, wal, ApplyConfig(salt_factor=1))                  # one epoch
    replay(t2, wal, ApplyConfig(max_segments=1, salt_factor=1))  # 8 epochs
    assert snapshot_table(t1).equals(snapshot_table(t2))
