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


def key_hash(keys: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic uint64 hash of a string key column."""
    obj = keys.to_numpy(zero_copy_only=False)
    if obj.dtype != object:
        obj = obj.astype(object)
    return hash_array(obj, categorize=False)


def assign_partitions(
    batch: pa.Table, num_partitions: int, salt_factor: int = 1
) -> pa.Table:
    """Append ``pid`` (and ``salt`` when salt_factor > 1) routing columns."""
    h = key_hash(batch.column("doc_id"))
    pid = (h % np.uint64(num_partitions)).astype(np.int32)
    batch = batch.append_column("pid", pa.array(pid, pa.int32()))
    if salt_factor > 1:
        salt = ((h >> np.uint64(33)) % np.uint64(salt_factor)).astype(np.int32)
        batch = batch.append_column("salt", pa.array(salt, pa.int32()))
    return batch


def partition_of(doc_id: str, num_partitions: int) -> int:
    """Partition id of a single key (driver-side lookups/tests)."""
    return int(key_hash(pa.array([doc_id]))[0] % np.uint64(num_partitions))
