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
    names = [o["table"] for o in out]
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
