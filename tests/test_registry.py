"""Multi-table registry: dependency-ordered sync of upsert dims + append
facts (the run_sync_cycle analog, /root/reference/etl/core/pipeline.py:341-347
— dims before facts)."""

import pytest

from clickhouse_data_pipeline_ray.pipelines.apply import ApplyConfig, snapshot_table
from clickhouse_data_pipeline_ray.schemas import FACT_SNAPSHOT_SCHEMA, SNAPSHOT_SCHEMA
from clickhouse_data_pipeline_ray.sources.gen import (
    FactGenParams,
    GenParams,
    generate_fact_wal,
    generate_wal,
)
from clickhouse_data_pipeline_ray.state import registry as R


def _setup(root):
    R.register_table(root, "documents", SNAPSHOT_SCHEMA, key_col="doc_id",
                     mode="upsert", num_partitions=4)
    R.register_table(
        root, "doc_events", FACT_SNAPSHOT_SCHEMA, key_col="event_id",
        mode="append",
        partition_spec={"kind": "time", "col": "event_ts", "granularity": "month"},
        depends_on=("documents",),
    )


def test_register_and_order(tmp_path):
    root = str(tmp_path / "lake")
    _setup(root)
    tables = R.load_registry(root)
    assert set(tables) == {"documents", "doc_events"}
    assert R.sync_order(tables) == ["documents", "doc_events"]
    # idempotent re-register with the same spec; conflicting spec rejected
    R.register_table(root, "documents", SNAPSHOT_SCHEMA, key_col="doc_id",
                     mode="upsert", num_partitions=4)
    with pytest.raises(ValueError, match="different spec"):
        R.register_table(root, "documents", SNAPSHOT_SCHEMA, key_col="doc_id",
                         mode="append", num_partitions=4)


def test_cycle_detection(tmp_path):
    root = str(tmp_path / "lake")
    _setup(root)
    specs = R.load_registry(root)
    bad = dict(specs)
    bad["documents"] = R.TableSpec(
        name="documents", schema_b64=specs["documents"].schema_b64,
        depends_on=("doc_events",),
    )
    with pytest.raises(ValueError, match="cycle"):
        R.sync_order(bad)


def test_sync_all_dims_before_facts(ray_session, tmp_path):
    root = str(tmp_path / "lake")
    _setup(root)
    dim_wal = str(tmp_path / "dimwal")
    generate_wal(dim_wal, GenParams(total_events=2_000, base_events=500,
                                    events_per_segment=1_000, seed=11,
                                    tok_min=4, tok_max=16))
    fact_wal = str(tmp_path / "factwal")
    generate_fact_wal(fact_wal, FactGenParams(total_events=1_500,
                                              events_per_segment=500))
    out = R.sync_all(root, {"documents": dim_wal, "doc_events": fact_wal},
                     ApplyConfig(salt_factor=1))
    names = [o["table"] for o in out if "table" in o]  # skip the lake-commit entry
    assert names == ["documents", "doc_events"]  # dependency order
    assert all("error" not in o for o in out)
    assert out[1]["events"] == 1_500
    docs = snapshot_table(R.table_dir(root, "documents"))
    facts = snapshot_table(R.table_dir(root, "doc_events"))
    assert docs.num_rows > 0 and facts.num_rows == 1_500
    status = R.registry_status(root)
    assert status["documents"]["mode"] == "upsert"
    assert status["doc_events"]["mode"] == "append"
    assert status["doc_events"]["watermark"] == 1_500

    # second cycle with no new data: no epochs, nothing double-applied
    out2 = R.sync_all(root, {"documents": dim_wal, "doc_events": fact_wal},
                      ApplyConfig(salt_factor=1))
    assert all(o["epochs"] == 0 for o in out2 if "epochs" in o)


def test_sync_all_skips_dependents_of_failed_table(ray_session, tmp_path):
    root = str(tmp_path / "lake")
    _setup(root)
    fact_wal = str(tmp_path / "factwal")
    generate_fact_wal(fact_wal, FactGenParams(total_events=500,
                                              events_per_segment=500))
    # documents WAL dir doesn't exist -> that table errors; its dependent is
    # skipped, not crashed
    out = R.sync_all(root, {"documents": str(tmp_path / "missing"),
                            "doc_events": fact_wal}, ApplyConfig())
    assert "error" in out[0] and out[0]["table"] == "documents"
    assert out[1] == {
        "table": "doc_events", "skipped": True,
        "reason": "dependency failed: ['documents']",
    }


def test_failed_registration_does_not_poison_registry(ray_session, tmp_path):
    """init_table validates the spec BEFORE the registry entry persists: a
    rejected registration must leave registry.json untouched so the
    corrected retry succeeds (regression: the old order wrote the entry
    first, and the retry died on 'already registered with a different
    spec' while registry_status crashed on the missing manifest)."""
    import pyarrow as pa

    from clickhouse_data_pipeline_ray.state.registry import (
        load_registry,
        register_table,
        registry_status,
    )

    root = str(tmp_path / "lake")
    schema = pa.schema(
        [("event_id", pa.string()), ("doc_id", pa.string()), ("lsn", pa.int64())]
    )
    # upsert + key_col event_id is rejected at DDL time
    with pytest.raises(ValueError, match="key_col"):
        register_table(root, "t", schema, key_col="event_id", mode="upsert")
    assert "t" not in load_registry(root)
    # corrected registration succeeds, status works
    register_table(root, "t", schema, key_col="doc_id", mode="upsert")
    assert "t" in load_registry(root)
    assert registry_status(root)["t"]["epoch"] == 0


# ---------------------------------------------------------------- lake epochs


def test_lake_epoch_pins_cross_table_consistent_reads(ray_session, tmp_path):
    """sync_all commits tables one at a time; the lake epoch vector gives
    readers an atomically-consistent {table -> epoch} snapshot. A reader
    pinned at lake epoch N must keep seeing round-N state for EVERY table
    even while a later sync round advances tables one by one."""
    from clickhouse_data_pipeline_ray.sources.gen import GenParams, generate_wal
    from clickhouse_data_pipeline_ray.state.registry import (
        commit_lake_epoch,
        lake_snapshot,
        load_lake,
        register_table,
        sync_all,
        table_dir,
    )
    from clickhouse_data_pipeline_ray.pipelines.apply import ApplyConfig, replay
    from clickhouse_data_pipeline_ray.schemas import SNAPSHOT_SCHEMA

    root = str(tmp_path / "lake")
    register_table(root, "dim", SNAPSHOT_SCHEMA, mode="upsert")
    register_table(root, "fact", SNAPSHOT_SCHEMA, mode="upsert",
                   depends_on=("dim",))
    dim_wal = str(tmp_path / "dw")
    fact_wal = str(tmp_path / "fw")
    generate_wal(dim_wal, GenParams(total_events=1_000, base_events=500,
                                    events_per_segment=500, seed=3))
    generate_wal(fact_wal, GenParams(total_events=1_000, base_events=500,
                                     events_per_segment=500, seed=4))

    out = sync_all(root, {"dim": dim_wal, "fact": fact_wal})
    lake1 = load_lake(root)
    assert lake1 is not None and lake1["lake_epoch"] == 1
    assert any("lake" in r for r in out)
    dim1 = lake_snapshot(root, "dim")
    fact1 = lake_snapshot(root, "fact")

    # half-finished round 2: ONLY the dim table advances (more WAL), no lake
    # commit — the reference's mid-sync inconsistency window
    generate_wal(dim_wal, GenParams(total_events=2_000, base_events=500,
                                    events_per_segment=500, seed=3))
    replay(table_dir(root, "dim"), dim_wal, ApplyConfig())
    assert load_lake(root)["lake_epoch"] == 1  # vector unchanged mid-round
    assert lake_snapshot(root, "dim").equals(dim1)  # pinned: old dim state
    assert lake_snapshot(root, "fact").equals(fact1)

    # round 2 completes: explicit lake commit captures the new vector
    lake2 = commit_lake_epoch(root)
    assert lake2["lake_epoch"] == 2
    assert not lake_snapshot(root, "dim").equals(dim1)
    # historical pin still resolves the OLD pair together
    assert lake_snapshot(root, "dim", lake_epoch=1).equals(dim1)
    assert lake_snapshot(root, "fact", lake_epoch=1).equals(fact1)


def test_lake_epoch_skipped_on_failed_round(ray_session, tmp_path):
    from clickhouse_data_pipeline_ray.state.registry import (
        load_lake,
        register_table,
        sync_all,
    )
    from clickhouse_data_pipeline_ray.schemas import SNAPSHOT_SCHEMA

    root = str(tmp_path / "lake")
    register_table(root, "dim", SNAPSHOT_SCHEMA, mode="upsert")
    out = sync_all(root, {"dim": str(tmp_path / "missing_wal")})
    assert any("error" in r for r in out)
    assert load_lake(root) is None  # failed round commits no lake epoch
