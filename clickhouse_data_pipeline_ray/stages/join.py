"""Distributed co-partitioned hash join (large × large).

The reference joins exclusively inside ClickHouse SQL
(/root/reference/etl/clickhouse_schema/kpi_views.sql — dim lookups and
fact⟕fact date joins); its ETL layer never joins two large tables itself.
This engine already covers the *small*-side cases with broadcast lookups
(pipelines/queries.py: map-side ``index_in``/``take``) and aggregate-first
shapes; this module adds the remaining case neither can express: joining two
datasets that are BOTH too large to broadcast.

Shape (Ray-Data-first, one genuine shuffle):

1. map-side: each batch of each side gets ``__jb = H(key) % B`` (SipHash via
   ``stages.partition.key_hash`` — deterministic across processes) and a
   ``__side`` tag; both sides are padded with typed-null columns to one
   unified schema so they can ``union`` (Arrow nulls cost one validity bit —
   no data is copied or widened).
2. ``union(...).groupby("__jb").map_groups(...)`` co-locates every row of
   either side with the same key hash — the single all-to-all exchange.
3. reduce-side: each bucket splits back into its left/right halves and joins
   them with Acero's vectorized C++ hash join (``pa.Table.join``) — no
   Python-row loops; the bucket count is cluster-sized (2×CPUs) so reduce
   parallelism scales with the node count.

Partitioning assumption (documented per the operator contract): key hashes
are ~uniform across buckets. A single join key hotter than ~1/B of either
side skews one bucket; salt such keys upstream (stages/partition.py salting)
or pre-aggregate the hot side first. Payload columns (not only keys) travel
through the shuffle — select/rename the needed columns *before* joining.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .partition import key_hash

_HELPER_COLS = ("__jb", "__side")

_JOIN_TYPES = (
    "inner",
    "left outer",
    "right outer",
    "full outer",
    "left semi",
    "right semi",
    "left anti",
    "right anti",
)


def _n_join_buckets() -> int:
    """Cluster-sized reduce fan-out (2×CPUs, floor 8) — same convention as
    the other bucketed map_groups stages; results are bucket-count-invariant
    (pure hash partitioning)."""
    from .partition import n_reduce_buckets

    return n_reduce_buckets()


def _multi_key_hash(batch: pa.Table, on: list[str]) -> np.ndarray:
    """Deterministic uint64 hash over one or more key columns (hash each
    column, mix with an odd-constant multiply + rotate so (a,b) != (b,a))."""
    h = key_hash(batch.column(on[0]))
    for col in on[1:]:
        h = h * np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant
        h = (h << np.uint64(7)) | (h >> np.uint64(57))
        h = h ^ key_hash(batch.column(col))
    return h


def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
    """Dataset schema as a pyarrow Schema. Parquet-backed datasets (the
    production path) carry one natively; pandas-block datasets (tests,
    ``from_pandas``) are mapped via numpy dtypes with object → string."""
    s = ds.schema()
    base = getattr(s, "base_schema", s)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, typ in zip(base.names, base.types):
        if isinstance(typ, pa.DataType):
            fields.append(pa.field(name, typ))
        else:
            np_typ = np.dtype(typ)
            fields.append(
                pa.field(
                    name,
                    pa.string() if np_typ == object else pa.from_numpy_dtype(np_typ),
                )
            )
    return pa.schema(fields)


def _unified_schema(
    left_schema: pa.Schema, right_schema: pa.Schema, on: list[str]
) -> pa.Schema:
    """Key columns (left's types) + left payload + right payload + helpers.
    Non-key column names must be disjoint — rename before joining."""
    for k in on:
        lt, rt = left_schema.field(k).type, right_schema.field(k).type
        if lt != rt:
            raise TypeError(f"join key {k!r}: left {lt} != right {rt}; cast first")
    left_payload = [f for f in left_schema if f.name not in on]
    right_payload = [f for f in right_schema if f.name not in on]
    overlap = {f.name for f in left_payload} & {f.name for f in right_payload}
    if overlap:
        raise ValueError(
            f"non-key columns present on both sides: {sorted(overlap)}; "
            "rename one side before hash_join (payloads travel the shuffle)"
        )
    fields = [left_schema.field(k) for k in on] + left_payload + right_payload
    fields += [pa.field("__jb", pa.int32()), pa.field("__side", pa.int8())]
    return pa.schema(fields)


def _pad_to(batch: pa.Table, schema: pa.Schema, on: list[str], side: int, n_buckets: int) -> pa.Table:
    """Map-side prep: bucket + side tag + typed-null padding to ``schema``."""
    if batch.num_rows == 0:
        return schema.empty_table()
    jb = (_multi_key_hash(batch, on) % np.uint64(n_buckets)).astype(np.int32)
    n = batch.num_rows
    cols = []
    for f in schema:
        if f.name == "__jb":
            cols.append(pa.array(jb, pa.int32()))
        elif f.name == "__side":
            cols.append(pa.array(np.full(n, side, np.int8), pa.int8()))
        elif f.name in batch.column_names:
            cols.append(batch.column(f.name).cast(f.type))
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(cols, schema=schema)


# ---------------------------------------------------------------------------
# Bloom prefilter: shrink the shuffle, never the result
# ---------------------------------------------------------------------------

_BLOOM_K = 7  # hash probes per key; with bits ≈ 10×keys → ~1% false positives


def _bloom_positions(h: np.ndarray, m_bits: int) -> np.ndarray:
    """(k, n) bit positions via double hashing (h1 + i·h2) — the standard
    Kirsch–Mitzenmacher construction, so one uint64 key hash yields all k
    probes with no further hashing."""
    h2 = h * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)  # odd ⇒ full period
    i = np.arange(_BLOOM_K, dtype=np.uint64)[:, None]
    return ((h[None, :] + i * h2[None, :]) % np.uint64(m_bits)).astype(np.uint64)


def build_bloom(
    ds: ray.data.Dataset, on: list[str], m_bits: int = 1 << 23
) -> np.ndarray:
    """Bloom bitarray over a dataset's join-key hashes. Each block emits one
    m/8-byte partial bitarray (map-side, streamed); the driver OR-folds the
    partials — driver state is O(m), independent of row count. Default 8 Mbit
    = 1 MiB, ~1% false-positive rate at 10⁶ distinct keys; size m ≈ 10 bits
    per expected distinct key."""

    def partial(b: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits // 8, np.uint8)
        if b.num_rows:
            pos = _bloom_positions(_multi_key_hash(b, on), m_bits).ravel()
            np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                             np.left_shift(1, (pos & np.uint64(7)).astype(np.int64)).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.large_binary())})

    out = np.zeros(m_bits // 8, np.uint8)
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for buf in batch.column("bits").to_pylist():
            out |= np.frombuffer(buf, np.uint8)
    return out


def _bloom_keep(batch: pa.Table, on: list[str], bits: np.ndarray) -> np.ndarray:
    """Boolean keep-mask: False only for rows whose key is DEFINITELY absent
    from the bloom-built side (all-probes test; false positives stay and are
    resolved by the exact join)."""
    m_bits = len(bits) * 8
    pos = _bloom_positions(_multi_key_hash(batch, on), m_bits)
    keep = np.ones(batch.num_rows, bool)
    for i in range(_BLOOM_K):
        p = pos[i]
        keep &= (bits[(p >> np.uint64(3)).astype(np.int64)]
                 >> (p & np.uint64(7)).astype(np.uint8)) & 1 != 0
    return keep


# join types for which dropping the OTHER side's definitely-unmatched rows
# cannot change the result, per bloom-build side
_BLOOM_SAFE = {
    "left": {"inner", "left outer", "left semi", "right semi", "left anti"},
    "right": {"inner", "right outer", "left semi", "right semi", "right anti"},
}


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str] | str,
    *,
    how: str = "inner",
    n_buckets: int | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    bloom: str | None = None,
    bloom_bits: int = 1 << 23,
) -> ray.data.Dataset:
    """Join two large Datasets on equal-named key columns.

    ``how`` is any Acero join type (``inner``, ``left outer``, ``right
    outer``, ``full outer``, ``left semi``, ``right semi``, ``left anti``,
    ``right anti``). Output columns: keys, then left payload, then right
    payload (semi/anti keep only the surviving side's columns, matching
    ``pa.Table.join``). Row order is unspecified — sort downstream if needed.

    Pass ``left_schema``/``right_schema`` when known: ``Dataset.schema()`` on
    a not-yet-executed pipeline triggers a one-block probe execution per
    side — measurable fixed cost on short interactive queries.

    ``bloom="left"|"right"`` prefilters the OTHER side through a Bloom
    filter of this side's keys before the shuffle — when one side is
    selective (a filtered dim, a key subset), most of the big side's rows
    are dropped map-side instead of travelling the exchange. The filter is
    built in one streamed pass (O(bloom_bits) driver state), shipped once
    via ``ray.put``, and NEVER changes the result (false positives are
    resolved by the exact per-bucket join) — it is therefore only accepted
    for join types where the other side's unmatched rows cannot reach the
    output (e.g. not ``full outer``; not filtering the preserved side of an
    outer/anti join).
    """
    on = [on] if isinstance(on, str) else list(on)
    if how not in _JOIN_TYPES:
        raise ValueError(f"how={how!r}; expected one of {_JOIN_TYPES}")
    if bloom is not None:
        if bloom not in ("left", "right"):
            raise ValueError(f"bloom={bloom!r}; expected 'left', 'right' or None")
        if how not in _BLOOM_SAFE[bloom]:
            raise ValueError(
                f"bloom={bloom!r} would drop rows that a {how!r} join must "
                f"preserve; allowed for {sorted(_BLOOM_SAFE[bloom])}"
            )
    if n_buckets is None:
        n_buckets = _n_join_buckets()
    if left_schema is None:
        left_schema = _arrow_schema(left)
    if right_schema is None:
        right_schema = _arrow_schema(right)
    schema = _unified_schema(left_schema, right_schema, on)
    left_names = [f.name for f in left_schema]
    right_names = [f.name for f in right_schema]

    if bloom is not None:
        bits_ref = ray.put(build_bloom(left if bloom == "left" else right,
                                       on, m_bits=bloom_bits))

        def prefilter(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            return b.filter(pa.array(_bloom_keep(b, on, ray.get(bits_ref))))

        if bloom == "left":
            right = right.map_batches(prefilter, batch_format="pyarrow")
        else:
            left = left.map_batches(prefilter, batch_format="pyarrow")

    tagged = left.map_batches(
        lambda b, s=schema: _pad_to(b, s, on, 0, n_buckets),
        batch_format="pyarrow",
    ).union(
        right.map_batches(
            lambda b, s=schema: _pad_to(b, s, on, 1, n_buckets),
            batch_format="pyarrow",
        )
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        side = group.column("__side")
        import pyarrow.compute as pc

        lt = group.filter(pc.equal(side, 0)).select(left_names)
        rt = group.filter(pc.equal(side, 1)).select(right_names)
        return lt.join(rt, keys=on, join_type=how)

    return tagged.groupby("__jb").map_groups(join_bucket, batch_format="pyarrow")
