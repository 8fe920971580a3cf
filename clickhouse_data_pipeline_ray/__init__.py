"""Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-realization of the capabilities of
samuelTyh/clickhouse-data-pipeline (an AdTech PostgreSQL -> Kafka/Debezium ->
ClickHouse pipeline) as a Ray Data engine: a binlog-style change-event tail
(LSN-ordered Parquet WAL segments) feeding a last-writer-wins lake upsert over
Parquet tables of pre-tokenized training sequences, with a per-partition
high-watermark manifest for exactly-once commits and resumable checkpoints.

Reference semantics preserved (see SURVEY.md for the full mapping):
- ``ReplacingMergeTree(updated_at) ORDER BY key`` (reference
  etl/clickhouse_schema/init.sql:14) -> vectorized LWW merge by max LSN
  (:mod:`.stages.merge`).
- Debezium op codes c/r/u/d (reference stream_etl/core/processor.py:186-217)
  -> vectorized op routing inside the merge kernel; deletes (unimplemented in
  the reference, processor.py:214-217) are real tombstones here.
- In-memory per-table watermark (reference etl/core/pipeline.py:197-202)
  -> persisted per-partition high-watermark manifest (:mod:`.state.manifest`).
- KPI materialized views (reference etl/clickhouse_schema/kpi_views.sql)
  -> grouped-aggregate Dataset jobs (:mod:`.pipelines.kpi`).

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (bench.py, CLI, test fixtures, or the grading driver).
"""

__version__ = "0.1.0"
