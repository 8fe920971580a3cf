"""JSONL WAL segments (interop: Debezium's wire format is JSON — the
reference consumes exactly that, stream_etl/core/consumer.py:48). The same
log written as .jsonl must replay to the identical snapshot as parquet."""

from dataclasses import replace

from clickhouse_data_pipeline_ray.pipelines.apply import (
    ApplyConfig,
    create_table,
    replay,
    snapshot_table,
)
from clickhouse_data_pipeline_ray.sources.gen import GenParams, generate_wal
from clickhouse_data_pipeline_ray.sources.wal import list_segments

PARAMS = GenParams(
    total_events=3_000, base_events=800, events_per_segment=500, seed=41,
    mix=(0.3, 0.55, 0.15), tok_min=4, tok_max=16,
)


def test_jsonl_wal_replays_identically(ray_session, tmp_path):
    w_pq, w_js = str(tmp_path / "wp"), str(tmp_path / "wj")
    generate_wal(w_pq, PARAMS)
    generate_wal(w_js, replace(PARAMS, fmt="jsonl"))
    segs = list_segments(w_js)
    assert segs and all(s.format == "jsonl" for s in segs)

    t_pq, t_js = str(tmp_path / "tp"), str(tmp_path / "tj")
    create_table(t_pq, num_partitions=4)
    create_table(t_js, num_partitions=4)
    replay(t_pq, w_pq, ApplyConfig(max_segments=3, salt_factor=1))
    replay(t_js, w_js, ApplyConfig(max_segments=3, salt_factor=1))
    assert snapshot_table(t_js).equals(snapshot_table(t_pq))


def test_mixed_format_wal(ray_session, tmp_path):
    """A WAL may mix formats (e.g. a JSON source migrated to parquet):
    one epoch reading both formats still converges."""
    import os

    w = str(tmp_path / "w")
    generate_wal(w, PARAMS)
    # rewrite every other segment as jsonl
    import pyarrow.parquet as pq

    for i, seg in enumerate(list_segments(w)):
        if i % 2 == 0:
            continue
        pq.read_table(seg.path).to_pandas().to_json(
            seg.path[: -len(".parquet")] + ".jsonl", orient="records", lines=True
        )
        os.remove(seg.path)
    fmts = {s.format for s in list_segments(w)}
    assert fmts == {"parquet", "jsonl"}

    t_mixed, t_ref = str(tmp_path / "tm"), str(tmp_path / "tr")
    create_table(t_mixed, num_partitions=4)
    create_table(t_ref, num_partitions=4)
    replay(t_mixed, w, ApplyConfig(salt_factor=1))
    w_ref = str(tmp_path / "wref")
    generate_wal(w_ref, PARAMS)
    replay(t_ref, w_ref, ApplyConfig(salt_factor=1))
    assert snapshot_table(t_mixed).equals(snapshot_table(t_ref))
