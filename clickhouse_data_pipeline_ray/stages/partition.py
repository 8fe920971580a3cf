"""Hash partitioning + skew-aware salting.

The reference shards by Kafka topic-per-table and ClickHouse monthly
partitions (/root/reference/stream_etl/core/config.py:41-44,
/root/reference/etl/clickhouse_schema/init.sql:40) and leaves skew unaddressed
(uniform workload, /root/reference/seeder/periodic_seed.py:120). Here the
engine owns partitioning explicitly: ``pid = H(doc_id) % P`` co-locates every
change for a key with its base partition; an independent bit-slice of the same
hash yields a ``salt`` sub-key so a hot partition's compaction work can fan
out to S sub-tasks (two-level LWW is safe because max-LSN per key is
associative — each doc_id maps to exactly one (pid, salt) bucket).

The hash is SipHash via ``pandas.util.hash_array`` (cython-vectorized,
deterministic with the fixed default key — stable across processes/runs,
unlike Python's randomized ``hash``). Stability across runs is required for
resumability: the manifest records ``num_partitions`` and the layout must not
move between epochs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pandas.util import hash_array


def n_reduce_buckets() -> int:
    """Reduce-group count for two-level bucketed reductions (~2 groups per
    CPU): every core stays busy while Python-per-group cost is O(CPUs), and
    reduce parallelism scales with the cluster instead of a hardcoded
    literal. Results are bucket-count-invariant everywhere this is used
    (pure hash partitioning; see test_queries_oracle bucket-invariance).
    The ONE copy of this policy — dedup/join/export/queries all import it."""
    import ray

    return max(8, 2 * int(ray.cluster_resources().get("CPU", 8)))


def key_hash(keys: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic uint64 hash of a string key column."""
    obj = keys.to_numpy(zero_copy_only=False)
    if obj.dtype != object:
        obj = obj.astype(object)
    return hash_array(obj, categorize=False)


def assign_partitions(
    batch: pa.Table, num_partitions: int, salt_factor: int = 1, key_col: str = "doc_id"
) -> pa.Table:
    """Append ``pid`` (and ``salt`` when salt_factor > 1) routing columns."""
    h = key_hash(batch.column(key_col))
    pid = (h % np.uint64(num_partitions)).astype(np.int32)
    batch = batch.append_column("pid", pa.array(pid, pa.int32()))
    if salt_factor > 1:
        salt = ((h >> np.uint64(33)) % np.uint64(salt_factor)).astype(np.int32)
        batch = batch.append_column("salt", pa.array(salt, pa.int32()))
    return batch


def assign_time_partitions(batch: pa.Table, ts_col: str) -> pa.Table:
    """Append ``pid = yyyymm(ts_col)`` — the analog of ClickHouse's
    ``PARTITION BY toYYYYMM(event_date)``
    (/root/reference/etl/clickhouse_schema/init.sql:40): fact reads prune by
    month at the manifest, never opening out-of-range partitions."""
    import pyarrow.compute as pc

    ts = batch.column(ts_col)
    n_null = ts.null_count
    if n_null:
        # a null partition timestamp would become a null pid and crash the
        # merge stage with a cryptic format error (poisoning its actor
        # pool); fail the epoch loudly at assignment time instead — the
        # null-key convention of make_normalize_fn
        raise ValueError(
            f"{n_null} event(s) with null partition timestamp {ts_col!r}"
        )
    pid = pc.add(
        pc.multiply(pc.year(ts).cast(pa.int32()), 100), pc.month(ts).cast(pa.int32())
    )
    return batch.append_column("pid", pid.cast(pa.int32()))


def yyyymm_of(ts) -> int:
    """Time-partition id of one timestamp (driver-side pruning/tests)."""
    return ts.year * 100 + ts.month


def assign_by_spec(batch: pa.Table, spec: dict, salt_factor: int = 1, key_col: str = "doc_id") -> pa.Table:
    """Routing-column assignment for a manifest partition_spec."""
    if spec.get("kind") == "time":
        return assign_time_partitions(batch, spec["col"])
    return assign_partitions(batch, spec["num"], salt_factor, key_col)


def partition_of(doc_id: str, num_partitions: int) -> int:
    """Partition id of a single key (driver-side lookups/tests)."""
    return int(key_hash(pa.array([doc_id]))[0] % np.uint64(num_partitions))
