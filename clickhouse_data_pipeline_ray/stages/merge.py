"""Last-writer-wins merge: the correctness heart of the engine.

Re-realizes ``ReplacingMergeTree(updated_at) ORDER BY (key)`` semantics
(/root/reference/etl/clickhouse_schema/init.sql:14-15,28-29) as a vectorized
Arrow kernel: per key, the row with the maximum version (LSN) wins; a winning
delete op is a tombstone that removes the key (the reference receives delete
events but drops them, /root/reference/stream_etl/core/processor.py:214-217 —
here they are implemented per the north rule).

LWW is an associative, commutative, idempotent reduction (argmax by LSN per
key), so it can be applied hierarchically: per input batch (pre-compaction
before the shuffle), per (pid, salt) sub-group (skew salting), and finally per
partition against the base snapshot — all yielding the same result as one
global pass. Tests pin this (tests/test_merge_kernel.py, tests/test_salting.py).
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schemas import cast_table, schema_from_b64

# Transient routing columns added by the partition stage.
ROUTING_COLS = ("pid", "salt")

# Tie-break rank: base-snapshot rows lose to change rows at equal LSN (an
# equal-LSN change is the same write replayed; preferring the change keeps
# re-apply bit-identical). The reference's RMT tie-break is arbitrary
# (init.sql:14); ours is deterministic.
_SRC_BASE = 0
_SRC_CHANGE = 1


def fsync_path(path: str) -> None:
    """fsync a file's data (or a directory's entries) by path."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def write_part_tmp(
    table_dir: str,
    pid: int,
    epoch: int,
    kind: str,
    table: pa.Table,
    compression: str = "zstd",
) -> tuple[str, int]:
    """The worker half of the commit protocol, shared by every part writer
    (MergeApply, CompactWorker, SnapshotWriter): write under a unique scratch
    name, fsync the FILE, then atomically move it to its ``.tmp`` name; the
    driver renames tmp→final at commit, fsyncs the part directories, and
    only then swaps the manifest. The file fsync orders the parquet bytes
    BEFORE the manifest that references them — without it a power loss could
    persist the manifest (which IS fsynced) while the parts it points at are
    still page-cache-only, leaving an unreadable table whose watermark has
    advanced past the WAL. The unique scratch name means a retried task
    never interleaves bytes with a concurrent writer's file.

    Returns (relative final path, bytes).

    OBJECT-STORE tables (state/store.py) skip the tmp/rename dance: the
    worker PUTs the part directly at its final, deterministic,
    epoch-stamped key (the Delta/Iceberg data-file model). The file is
    invisible until a committed manifest references it; a retried epoch
    re-puts identical bytes; a losing writer's parts become GC-able
    orphans."""
    part_dir = os.path.join(table_dir, "parts", f"pid={pid:05d}")
    os.makedirs(part_dir, exist_ok=True)
    rel = os.path.join("parts", f"pid={pid:05d}", f"{kind}-{epoch:06d}.parquet")
    from ..state.store import put_file_object, store_kind

    if store_kind(table_dir) == "object":
        size = put_file_object(
            os.path.join(table_dir, rel),
            lambda staging: pq.write_table(table, staging, compression=compression),
        )
        return rel, size
    tmp_path = os.path.join(table_dir, rel + ".tmp")
    scratch = f"{tmp_path}.{os.getpid()}"
    pq.write_table(table, scratch, compression=compression)
    fsync_path(scratch)
    os.replace(scratch, tmp_path)
    return rel, os.path.getsize(tmp_path)


def promote_part(table_dir: str, rel: str) -> None:
    """The driver half of the commit protocol: rename a worker-written
    ``.tmp`` part to its final name and fsync the parent directory, so the
    rename is durable BEFORE the manifest swap that references it.
    Object-store tables have nothing to promote — parts were PUT at their
    final keys and visibility is decided by the manifest swap alone."""
    from ..state.store import store_kind

    if store_kind(table_dir) == "object":
        return
    final = os.path.join(table_dir, rel)
    os.replace(final + ".tmp", final)
    fsync_path(os.path.dirname(final))


def column_zones(table: pa.Table, skip_cols: list[str] | tuple) -> dict:
    """Per-column ``[lo, hi]`` minmax zone over one written part — the
    ClickHouse ``INDEX ... TYPE minmax`` skip-index analog, computed at part
    write time (where ClickHouse computes granule marks at merge time) and
    stored in the manifest so range scans prune files without opening them.

    Rules (the export zone-map lessons, pipelines/export.py:110-121):
    - nulls are skipped (min_max default) and NaNs are dropped explicitly —
      a NaN min/max would poison every overlap test AND json-serialize as a
      nonstandard token;
    - timestamps/dates normalize to int64 microseconds (JSON-safe, readers
      cast bounds the same way);
    - an all-null/all-NaN/empty column gets a ``None`` zone = "no information"
      → always treated as overlapping on read (prunes nothing, never wrong).
    """
    zones: dict = {}
    for c in skip_cols:
        if c not in table.column_names or table.num_rows == 0:
            zones[c] = None
            continue
        col = table.column(c)
        t = col.type
        if pa.types.is_timestamp(t) or pa.types.is_date(t):
            col = col.cast(pa.timestamp("us")).cast(pa.int64())
        elif pa.types.is_floating(t):
            col = col.filter(pc.invert(pc.fill_null(pc.is_nan(col), False)))
        mm = pc.min_max(col)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        zones[c] = None if lo is None else [lo, hi]
    return zones


def zone_bound(value, field_type: pa.DataType):
    """Normalize a user predicate bound to its column's zone domain (the
    same mapping column_zones applies to the data)."""
    if value is None:
        return None
    if pa.types.is_timestamp(field_type) or pa.types.is_date(field_type):
        return pa.scalar(value).cast(pa.timestamp("us")).cast(pa.int64()).as_py()
    return value


def _last_wins_mask(keys: pa.Array) -> pa.Array:
    """Boolean mask selecting the last row of each equal-key run.

    ``keys`` must be sorted. Vectorized: row i wins iff keys[i] != keys[i+1].

    Null-safe: ``not_equal`` is null (→ False after cast) whenever either
    side is null, which would silently DROP the last real key's winner
    adjacent to the null run and keep a null-key row. Nulls compare here as
    one ordinary key group: exactly-one-null = different keys (True),
    both-null = same key (False). The CDC path additionally rejects null
    keys loudly at normalize time; this guard protects every other caller
    (dedup's keep-min reduction, user tables)."""
    n = len(keys)
    if n == 0:
        return pa.array([], type=pa.bool_())
    a, b = keys.slice(0, n - 1), keys.slice(1, n - 1)
    neq = pc.fill_null(pc.not_equal(a, b), False)
    one_null = pc.xor(pc.is_null(a), pc.is_null(b))
    mask = np.ones(n, dtype=bool)
    mask[: n - 1] = pc.or_(neq, one_null).to_numpy(zero_copy_only=False)
    return pa.array(mask)


def lww_compact(
    table: pa.Table,
    key: str = "doc_id",
    version: str = "lsn",
    src_rank: str | None = None,
    version_order: str = "max",
) -> pa.Table:
    """Keep, per key, only the max-version row (tombstones retained as rows).
    ``version_order="min"`` flips the winner to the minimum version — the
    keep-smallest-key reduction dedup uses (same payload-aware kernel).

    Used as the per-batch pre-compaction combiner (shrinks update-heavy change
    streams *before* the shuffle — the partial-aggregation pattern) and as the
    per-(pid, salt) sub-group compactor for skew salting.

    Payload-aware: sorts only the (key, version) columns and gathers just the
    winning rows — the wide ``tokens`` payload is never moved for losing
    rows (a full-table sort_by gathers every column; with 2 KB rows that
    dominates the merge CPU). Output rows come out key-sorted.
    """
    if table.num_rows == 0:
        return table
    vdir = "ascending" if version_order == "max" else "descending"
    sort_keys = [(key, "ascending"), (version, vdir)]
    if src_rank is not None:
        sort_keys.append((src_rank, "ascending"))
    idx = pc.sort_indices(
        table.select([k for k, _ in sort_keys]), sort_keys=sort_keys
    )
    keys_sorted = pc.take(table.column(key), idx).combine_chunks()
    mask = _last_wins_mask(keys_sorted)
    winners = pc.filter(idx, mask)
    return table.take(winners)


def sum_compact(
    table: pa.Table,
    key: str = "doc_id",
    sum_cols: list[str] | tuple = (),
    version: str = "lsn",
) -> pa.Table:
    """SummingMergeTree-analog reduction: one row per key, with ``sum_cols``
    summed across the key's rows and every OTHER column taken from the
    max-``version`` row (ClickHouse keeps an arbitrary value for non-summed
    columns, init.sql's SummingMergeTree engine for the kpi views,
    /root/reference/etl/clickhouse_schema/kpi_views.sql:5-8 — ours is
    deterministic: last writer wins).

    Associative and commutative (sums and max both are; LSNs are unique per
    event so the max-version row is unambiguous), so it folds hierarchically
    exactly like :func:`lww_compact`: per batch before the shuffle, per
    (pid, salt) sub-group, and per partition against the base — partial sums
    compose to the same result as one global pass. Output is key-sorted.

    Summed values are cast back to the column's declared type — an overflow
    raises loudly (declare wide-enough measure types at DDL time)."""
    if table.num_rows == 0:
        return table
    sum_cols = [c for c in sum_cols if c in table.column_names]
    if not sum_cols:
        return lww_compact(table, key=key, version=version)
    # non-sum columns: payload-aware LWW (key-sorted winners, losers' payload
    # never gathered); sum columns: one vectorized hash aggregation
    winners = lww_compact(
        table.drop_columns(sum_cols), key=key, version=version
    )
    sums = (
        table.select([key] + sum_cols)
        .group_by(key)
        .aggregate([(c, "sum") for c in sum_cols])
        .sort_by([(key, "ascending")])
    )
    if sums.num_rows != winners.num_rows:  # pragma: no cover - invariant
        raise AssertionError(
            f"sum_compact key mismatch: {sums.num_rows} summed keys vs "
            f"{winners.num_rows} LWW winners"
        )
    cols = {}
    for name in table.column_names:
        if name in sum_cols:
            cols[name] = sums.column(f"{name}_sum").cast(
                table.schema.field(name).type
            )
        else:
            cols[name] = winners.column(name)
    return pa.table(cols)


def sum_merge_file_tables(
    tables: list[pa.Table],
    snapshot_schema: pa.Schema,
    sum_cols: list[str] | tuple,
) -> pa.Table:
    """Fold a sum-mode partition's file chain (summed base snapshot +
    partial-sum delta files) into the merged state. Files carry no ``op``
    column (sum tables are insert-only — additive deltas, no tombstones);
    the fold is a plain concat + :func:`sum_compact`, valid in any order
    because partial sums compose. Non-sum columns resolve to the max-LSN
    contribution (base rows store their last contributor's LSN, deltas are
    strictly newer by the watermark filter — no ties)."""
    parts = [cast_table(t, snapshot_schema) for t in tables if t.num_rows]
    if not parts:
        return snapshot_schema.empty_table()
    if len(parts) == 1:
        # any committed sum part is already one-row-per-key and key-sorted
        return parts[0]
    return sum_compact(
        pa.concat_tables(parts, promote_options="none"), sum_cols=sum_cols
    )


def collapse_compact(
    table: pa.Table,
    key: str = "doc_id",
    sign_col: str = "sign",
    version: str = "lsn",
) -> pa.Table:
    """CollapsingMergeTree-analog reduction to a MERGEABLE partial state.

    Raw change rows carry ``sign`` ∈ {+1 (state), −1 (cancel)}; the key's
    truth is ``net = Σ sign`` (alive iff net > 0) with payload from the
    max-version STATE row. The partial encoding makes that fold associative
    under ARBITRARY row splits (batches split a key's events randomly, so
    epoch-ordered folds are not enough):

    - *winner row*: max-``version`` row among ``sign > 0 ∧ version non-null``
      rows — raw +1 rows and prior winner rows both qualify; cancel rows and
      adjustment rows (null version) never do. Emitted with
      ``sign = net`` when net > 0 (the common, single-row case) or
      ``sign = 1`` when the key is currently net-cancelled (the winner must
      survive the fold: a batch split can put the latest state in a
      net-≤0 fragment — see test_collapse_hierarchical_arbitrary_splits).
    - *adjustment row* (only when needed): null payload, ``sign = net − 1``
      beside a cancelled winner, or ``sign = net`` for a key with no state
      row yet — always ≤ −1 (a winnerless key's net is strictly negative),
      so adjustment rows are never winner candidates. Their ``version`` is
      the key's max version in the fold (a REAL value: watermark re-filters
      must pass these rows — a null version would silently drop the cancel
      balance at the merge's idempotency filter).

    Σ sign over the emitted rows always equals the key's true net, and
    re-folding emitted rows reproduces them — associative, commutative,
    idempotent-under-refold, exactly like the LWW and sum kernels. A key
    whose net is 0 with no winner disappears entirely; a cancelled key keeps
    at most 2 thin rows until TTL/mutation removes them (ClickHouse's
    collapsing merges keep residual rows in the uneven cases too).
    Final user-facing reads apply :func:`collapse_finalize`.
    """
    if table.num_rows == 0:
        return table
    import pandas as pd

    sign = table.column(sign_col)
    ver = table.column(version)
    cand_mask = pc.and_(
        pc.fill_null(pc.greater(sign, pa.scalar(0).cast(sign.type)), False),
        pc.is_valid(ver),
    )
    winners = lww_compact(
        table.filter(cand_mask).drop_columns([sign_col]),
        key=key,
        version=version,
    )  # key-sorted, one row per key-with-state
    nets = (
        table.select([key, sign_col, version])
        .group_by(key)
        .aggregate([(sign_col, "sum"), (version, "max")])
        .sort_by([(key, "ascending")])
    )
    net_keys = nets.column(key)
    net = nets.column(f"{sign_col}_sum").to_numpy(zero_copy_only=False)
    max_ver = nets.column(f"{version}_max")
    w_idx = pd.Index(winners.column(key).to_pandas()).get_indexer(
        net_keys.to_pandas()
    )
    has_w = w_idx >= 0
    sign_type = table.schema.field(sign_col).type

    out_parts = []
    if has_w.any():
        w_take = winners.take(pa.array(w_idx[has_w]))
        w_net = net[has_w]
        # alive keys carry their whole net on the winner row; cancelled
        # winners keep sign=1 and push the balance to an adjustment row
        w_sign = np.where(w_net > 0, w_net, 1)
        w_take = w_take.append_column(
            sign_col, pa.array(w_sign).cast(sign_type)
        )
        out_parts.append(w_take.select(table.column_names))
    # adjustment rows: cancelled winners (net-1) + winnerless keys (net)
    adj_w = has_w & (net <= 0)
    adj_n = (~has_w) & (net != 0)
    adj_keys = pa.concat_arrays(
        [
            net_keys.filter(pa.array(adj_w)).combine_chunks(),
            net_keys.filter(pa.array(adj_n)).combine_chunks(),
        ]
    )
    if len(adj_keys):
        adj_sign = np.concatenate([net[adj_w] - 1, net[adj_n]])
        adj_ver = pa.concat_arrays(
            [
                max_ver.filter(pa.array(adj_w)).combine_chunks(),
                max_ver.filter(pa.array(adj_n)).combine_chunks(),
            ]
        )
        n_adj = len(adj_keys)
        cols = {}
        for name in table.column_names:
            if name == key:
                cols[name] = adj_keys
            elif name == sign_col:
                cols[name] = pa.array(adj_sign).cast(sign_type)
            elif name == version:
                cols[name] = adj_ver
            else:
                cols[name] = pa.nulls(n_adj, table.schema.field(name).type)
        out_parts.append(pa.table(cols))
    if not out_parts:
        return table.schema.empty_table()
    out = pa.concat_tables(out_parts, promote_options="none")
    # deterministic bytes: key order, winner row before its adjustment row
    # (null version sorts after real versions)
    return out.sort_by([(key, "ascending"), (version, "ascending")])


def collapse_finalize(
    table: pa.Table,
    key: str = "doc_id",
    sign_col: str = "sign",
    version: str = "lsn",
) -> pa.Table:
    """Partial state → user-facing snapshot: keys with net > 0 only, one
    winner row each (its ``sign`` already holds the net). Assumes ``table``
    is collapse_compact output (≤2 rows per key)."""
    if table.num_rows == 0:
        return table
    import pandas as pd

    nets = (
        table.select([key, sign_col]).group_by(key).aggregate([(sign_col, "sum")])
    )
    alive = nets.filter(
        pc.greater(nets.column(f"{sign_col}_sum"), pa.scalar(0))
    ).column(key)
    winner_mask = pc.and_(
        pc.fill_null(
            pc.greater(table.column(sign_col), pa.scalar(0).cast(
                table.schema.field(sign_col).type
            )),
            False,
        ),
        pc.is_valid(table.column(version)),
    )
    winners = table.filter(winner_mask)
    keep = pc.is_in(winners.column(key), value_set=alive.combine_chunks())
    return winners.filter(keep)


def collapse_merge_file_tables(
    tables: list[pa.Table],
    snapshot_schema: pa.Schema,
    sign_col: str = "sign",
) -> pa.Table:
    """Fold a collapse-mode partition's file chain (partial-state base +
    partial delta files) — plain concat + :func:`collapse_compact`, valid in
    any order because the partial encoding composes. Output is PARTIAL state
    (residual cancel balances retained); user reads finalize."""
    parts = [cast_table(t, snapshot_schema) for t in tables if t.num_rows]
    if not parts:
        return snapshot_schema.empty_table()
    if len(parts) == 1:
        return parts[0]
    return collapse_compact(
        pa.concat_tables(parts, promote_options="none"), sign_col=sign_col
    )


def merge_file_tables(
    tables: list[pa.Table],
    snapshot_schema: pa.Schema,
    drop_tombstones: bool = True,
) -> pa.Table:
    """LWW-merge a partition's file chain (base snapshot + delta files).

    ``tables`` must be in commit order (oldest first). Snapshot files carry no
    ``op`` column (implicitly all-alive, op='c'); delta files keep ``op`` so
    their tombstones participate. Winner per key = max (lsn, file rank). This
    is the MERGE-on-read kernel (the read-time half of ReplacingMergeTree
    semantics, /root/reference/etl/clickhouse_schema/init.sql:14-15): the
    write path appends O(changes) deltas and reads reconstruct the merged
    state, so per-epoch write cost never scales with table size.
    """
    parts = []
    for rank, t in enumerate(tables):
        if t.num_rows == 0:
            continue
        has_op = "op" in t.column_names
        op = t.column("op") if has_op else None
        t = cast_table(t, snapshot_schema)
        n = t.num_rows
        if op is None:
            op = pa.nulls(n, pa.string()).fill_null("c")
        t = t.append_column("op", op.cast(pa.string()) if op.type != pa.string() else op)
        # int32: a delta chain can legally exceed 127 files (the CLI accepts
        # any --compact-threshold), and int8 fill_null would raise there.
        t = t.append_column("_src", pa.nulls(n, pa.int32()).fill_null(rank))
        parts.append(t)
    if not parts:
        return snapshot_schema.empty_table()
    combined = pa.concat_tables(parts, promote_options="none")
    winners = lww_compact(combined, src_rank="_src")
    if drop_tombstones:
        winners = winners.filter(pc.not_equal(winners.column("op"), pa.scalar("d")))
        return cast_table(winners, snapshot_schema)
    op = winners.column("op")
    return cast_table(winners, snapshot_schema).append_column("op", op)


def merge_base_and_changes(
    base: pa.Table | None,
    changes: pa.Table,
    snapshot_schema: pa.Schema,
) -> pa.Table:
    """MERGE: base snapshot ⊔ change rows → new snapshot (tombstones dropped).

    ``base`` rows carry the LSN of their last writer (stored in the snapshot),
    so re-merging is a pure LWW reduction. ``changes`` must have an ``op``
    column; the result conforms to ``snapshot_schema`` and is key-sorted for
    deterministic output files (exactly-once re-runs produce identical bytes).

    Thin wrapper over :func:`merge_file_tables` — there is ONE LWW merge
    kernel in the engine, so the semantics the tests pin here are exactly the
    semantics the shipped apply/compact path runs (a base snapshot carries no
    ``op`` column → implicit all-alive at rank 0; the change table keeps
    ``op`` at rank 1, the equal-LSN tie-break the kernel defines).
    """
    changes = changes.drop_columns(
        [c for c in ROUTING_COLS if c in changes.column_names]
    )
    tables = [base] if base is not None else []
    return merge_file_tables(tables + [changes], snapshot_schema)


def _stats_row(
    pid: int,
    rows: int,
    exact: bool,
    nbytes: int,
    applied: int,
    deletes: int,
    max_lsn: int,
    new_file: str,
    files: list[str],
    merge_s: float,
    max_event_ts_us: int | None = None,
    late_events: int = 0,
    zones_json: str = "",
) -> pa.Table:
    import json

    return pa.table(
        {
            "pid": pa.array([pid], pa.int32()),
            "rows": pa.array([rows], pa.int64()),
            "exact": pa.array([exact], pa.bool_()),
            "bytes": pa.array([nbytes], pa.int64()),
            "applied": pa.array([applied], pa.int64()),
            "deletes": pa.array([deletes], pa.int64()),
            "max_lsn": pa.array([max_lsn], pa.int64()),
            "new_file": pa.array([new_file], pa.string()),
            "files_json": pa.array([json.dumps(files)], pa.string()),
            "merge_s": pa.array([time.perf_counter() - merge_s], pa.float64()),
            # event-time partials (None/0 when the table has no event-time
            # column): combined on the driver into the epoch's event-time
            # watermark advance + late-arrival count.
            "max_event_ts_us": pa.array([max_event_ts_us], pa.int64()),
            "late_events": pa.array([late_events], pa.int64()),
            # skip-index partial: {rel_file: {col: [lo, hi] | None}} for the
            # file(s) THIS call wrote ("" when no skip_cols / no new file).
            # The driver folds it into partitions[pid]["zones"] at commit.
            "zones_json": pa.array([zones_json], pa.string()),
        }
    )


def merge_needed_columns(
    snapshot_schema: pa.Schema,
    columns: list[str] | None,
    mode: str,
    key_col: str = "doc_id",
) -> tuple[pa.Schema, list[str]] | tuple[None, None]:
    """Column pushdown for merge-on-read: the physical columns a pruned
    partition read must fetch = the requested ``columns`` plus whatever the
    mode's merge kernel keys on (key + lsn for LWW/sum/collapse, + sign for
    collapse; append folds nothing). Returns (pruned snapshot schema in
    declared order, physical column list), or (None, None) for a full read.
    At the 100-TB design point this is the difference between moving the
    wide ``tokens`` payload for a 2-column scan and not."""
    if columns is None:
        return None, None
    need = set(columns)
    if mode in ("upsert", "sum"):
        need |= {key_col, "lsn"}
    elif mode == "collapse":
        need |= {key_col, "lsn", "sign"}
    missing = need - set(snapshot_schema.names)
    if missing:
        raise ValueError(
            f"columns {sorted(missing)} not in table schema "
            f"{list(snapshot_schema.names)}"
        )
    sub = pa.schema([f for f in snapshot_schema if f.name in need])
    return sub, list(sub.names)


def _read_file_cols(path: str, want: list[str] | None) -> pa.Table:
    """Read one part file, fetching only ``want`` columns that physically
    exist in it (delta files carry ``op``; snapshots don't — a blind
    ``columns=`` would error on the difference). ``op`` is always fetched
    when present: the merge kernel needs tombstones regardless of the
    user's projection."""
    if want is None:
        return pq.read_table(path)
    pf = pq.ParquetFile(path)
    names = set(pf.schema_arrow.names)
    cols = [c for c in want if c in names]
    if "op" in names:
        cols.append("op")
    return pf.read(columns=cols)


def read_partition(
    table_dir: str,
    files: list[str],
    snapshot_schema: pa.Schema,
    mode: str = "upsert",
    sum_cols: list[str] | tuple = (),
    columns: list[str] | None = None,
) -> pa.Table:
    """Reconstruct one partition's merged state from its file chain.

    Upsert fast path: a single clean snapshot file needs only a schema cast
    (no sort, no merge) — the common case after compaction. Append mode:
    the chain is immutable rows, so reconstruction is a plain concat —
    never an LWW merge (duplicate business keys are legal in facts). Sum
    mode: the chain is partial sums, folded by :func:`sum_merge_file_tables`.

    ``columns`` pushes projection into the parquet reads: only the requested
    columns plus the mode's merge keys leave storage (see
    :func:`merge_needed_columns`); the result still contains the merge keys
    — callers select the final projection."""
    phys = None
    if columns is not None:
        snapshot_schema, phys = merge_needed_columns(
            snapshot_schema, columns, mode
        )
    tables = [
        _read_file_cols(os.path.join(table_dir, f), phys) for f in files
    ]
    if mode == "sum" and columns is not None:
        sum_cols = [c for c in sum_cols if c in snapshot_schema.names]
    if mode == "append":
        parts = [cast_table(t, snapshot_schema) for t in tables if t.num_rows]
        if not parts:
            return snapshot_schema.empty_table()
        return pa.concat_tables(parts, promote_options="none")
    if mode == "sum":
        return sum_merge_file_tables(tables, snapshot_schema, sum_cols)
    if mode == "collapse":
        # PARTIAL state (residuals kept) — user-facing readers finalize
        return collapse_merge_file_tables(tables, snapshot_schema)
    if len(tables) == 1 and "op" not in tables[0].column_names:
        return cast_table(tables[0], snapshot_schema)
    return merge_file_tables(tables, snapshot_schema)


def read_partition_final(
    table_dir: str,
    files: list[str],
    snapshot_schema: pa.Schema,
    mode: str = "upsert",
    sum_cols: list[str] | tuple = (),
    columns: list[str] | None = None,
) -> pa.Table:
    """:func:`read_partition` + user-facing finalize: collapse tables return
    alive winners only (the partial winner+adjustment encoding stripped, as
    :func:`make_partition_reader` does). Every OTHER mode's merged state is
    already final. Artifact derivers / snapshot scorers must read through
    this, never raw :func:`read_partition` — counting a cancelled key's
    winner row or a null-payload adjustment row would poison derived counts
    (token indexes, classifier/LM/BPE partials, quality scores)."""
    t = read_partition(table_dir, files, snapshot_schema, mode, sum_cols, columns)
    if mode == "collapse":
        t = collapse_finalize(t)
    return t


def make_partition_reader(
    table_dir: str,
    snapshot_schema_b64: str,
    files_by_pid: dict[str, list[str]],
    mode: str = "upsert",
    sum_cols: list[str] | tuple = (),
    columns: list[str] | None = None,
):
    """Stateless map_batches fn for MERGE-on-read over pid-descriptor rows.
    ``columns`` pushes projection into the parquet reads (merge keys are
    fetched as needed and dropped again — the emitted batches hold exactly
    the requested columns)."""

    def read_pids(batch: pa.Table) -> pa.Table:
        schema = schema_from_b64(snapshot_schema_b64)
        out = []
        for pid in batch.column("pid").to_pylist():
            files = files_by_pid.get(str(pid)) or []
            if files:
                t = read_partition(
                    table_dir, files, schema, mode, sum_cols, columns
                )
                if mode == "collapse":
                    # user-facing read: partial state → alive winners only
                    t = collapse_finalize(t)
                if columns is not None:
                    t = t.select(columns)
                out.append(t)
        if not out:
            if columns is not None:
                return pa.schema(
                    [schema.field(c) for c in columns]
                ).empty_table()
            return schema.empty_table()
        return pa.concat_tables(out)

    return read_pids


class MergeApply:
    """Stateful merge worker: applies one partition's change group per call.

    Runs as an actor pool via
    ``grouped.map_groups(MergeApply, concurrency=(m, n), batch_format="pyarrow")``
    — the Ray Data analog of the reference's long-lived loader with its DB
    connection + watermark (/root/reference/etl/core/db.py:113-115,
    /root/reference/etl/core/pipeline.py:197-202). Per-partition state
    (base-file paths, watermarks, target schema) is resolved once in
    ``__init__``; each ``__call__`` handles one pid group.

    Two write modes:

    - ``delta`` (default, the scale path): LWW-compact the partition's change
      group and append it as ``delta-{epoch}.parquet`` (tombstones + ``op``
      retained). Per-epoch write cost is O(changes), never O(table) — at the
      10^10-event design point a partition's base may be tens of GB while an
      epoch touches a few MB of it. When the file chain reaches
      ``compact_threshold`` the call compacts instead: merge base + deltas +
      changes into a single clean ``snapshot-{epoch}.parquet`` (bounded read
      amplification, LSM-style).
    - ``snapshot``: always fully merge and rewrite (MERGE-on-write); kept for
      small tables and as the compaction primitive.

    Output files are written as ``*.parquet.tmp`` and renamed / committed by
    the driver only after *all* partitions succeed (exactly-once: a crashed
    epoch leaves no visible state; re-running rewrites the same deterministic
    bytes).
    """

    def __init__(
        self,
        table_dir: str,
        epoch: int,
        partitions: dict[str, dict],
        snapshot_schema_b64: str,
        write_mode: str = "snapshot",
        compact_threshold: int = 8,
        mode: str = "upsert",
        default_watermark: int = 0,
        event_time_col: str = "",
        event_time_watermark_us: int | None = None,
        allowed_lateness_us: int = 0,
        sum_cols: list[str] | tuple = (),
        skip_cols: list[str] | tuple = (),
    ):
        self.table_dir = table_dir
        self.epoch = epoch
        self.partitions = partitions
        self.snapshot_schema = schema_from_b64(snapshot_schema_b64)
        self.write_mode = write_mode
        self.compact_threshold = compact_threshold
        self.mode = mode
        self.sum_cols = list(sum_cols)
        self.skip_cols = list(skip_cols)
        # watermark for partitions the manifest hasn't seen yet (dynamic
        # time partitions): the table-level committed floor.
        self.default_watermark = default_watermark
        # event-time watermark accounting (late-data metrics): the committed
        # table-level event-time high-water mark as of the PREVIOUS epoch; an
        # event this epoch is "late" if its event time is more than
        # allowed_lateness behind it. Disabled when the col is "".
        self.event_time_col = event_time_col
        self.event_time_watermark_us = event_time_watermark_us
        self.allowed_lateness_us = allowed_lateness_us

    def _threshold(self, pid) -> int:
        """Effective compact threshold for one partition: the configured value
        minus a deterministic per-pid jitter, bounded to (T/2, T].

        Partitions that fill at the same rate (uniform key hashing does
        exactly that) would otherwise all hit the threshold in the SAME
        epoch and compact together — a synchronized ~T× latency spike every
        T epochs on the micro-batch path. Downward jitter keeps the
        configured threshold as a hard chain-length bound (the documented
        invariant tests pin) while spreading compaction epochs across
        partitions. crc32 keeps it stable across processes, so crashed-epoch
        re-runs still produce identical bytes (exactly-once)."""
        span = self.compact_threshold // 2
        if span <= 0:
            return self.compact_threshold
        return self.compact_threshold - (zlib.crc32(str(pid).encode()) % span)

    def _event_time_partials(self, changes: pa.Table) -> tuple[int | None, int]:
        """(max event-time us, late-event count) for one change group."""
        col = self.event_time_col
        if not col or col not in changes.column_names or changes.num_rows == 0:
            return None, 0
        ts = changes.column(col).cast(pa.timestamp("us")).cast(pa.int64())
        ev_max = pc.max(ts).as_py()
        if self.event_time_watermark_us is None:
            return ev_max, 0
        bound = self.event_time_watermark_us - self.allowed_lateness_us
        late = pc.sum(pc.less(ts, pa.scalar(bound)).cast(pa.int64())).as_py() or 0
        return ev_max, int(late)

    def _read_files(self, meta: dict) -> list[pa.Table]:
        return [
            pq.read_table(os.path.join(self.table_dir, f))
            for f in (meta.get("files") or [])
        ]

    def _write(self, table: pa.Table, pid: int, kind: str) -> tuple[str, int]:
        # zstd for long-lived snapshots, lz4 for short-lived deltas (cheaper
        # to write; they are rewritten away at the next compaction anyway).
        comp = "lz4" if kind == "delta" else "zstd"
        return write_part_tmp(self.table_dir, pid, self.epoch, kind, table, comp)

    def _zjson(self, rel: str, table: pa.Table) -> str:
        """Skip-index partial for one written part ("" when the table
        declares no skip cols — the stats row stays empty, zero overhead)."""
        if not self.skip_cols:
            return ""
        return json.dumps({rel: column_zones(table, self.skip_cols)})

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        pid = group.column("pid")[0].as_py()
        meta = self.partitions.get(str(pid)) or {
            "watermark_lsn": self.default_watermark,
            "rows": 0,
            "bytes": 0,
            "files": [],
        }
        watermark = int(meta["watermark_lsn"])
        old_files = list(meta.get("files") or [])

        # Idempotent re-apply: skip events at or below this partition's
        # committed watermark (the manifest is the single source of truth,
        # unlike the reference's in-memory last_sync, pipeline.py:197-202).
        changes = group.filter(pc.greater(group.column("lsn"), pa.scalar(watermark)))
        n_applied = changes.num_rows
        ops = changes.column("op")
        n_del = pc.sum(pc.equal(ops, pa.scalar("d")).cast(pa.int64())).as_py() or 0
        max_lsn = int(pc.max(changes.column("lsn")).as_py() or watermark) if n_applied else watermark

        if n_applied == 0:
            return _stats_row(
                pid, int(meta.get("rows", 0)), bool(meta.get("exact_rows", True)),
                int(meta.get("bytes", 0)), 0, 0, watermark, "", old_files, t0,
            )
        ev_max, ev_late = self._event_time_partials(changes)

        if self.mode == "append":
            # Append-only facts: immutable rows, no LWW, no tombstones.
            # Write the epoch's rows as one append part (lsn-sorted for
            # deterministic bytes); when the chain reaches the threshold,
            # coalesce it into one file (plain concat — cheap file-count
            # hygiene, not a merge).
            rows = changes.drop_columns(
                [c for c in ("op", *ROUTING_COLS) if c in changes.column_names]
            )
            rows = cast_table(rows, self.snapshot_schema).sort_by(
                [("lsn", "ascending")]
            )
            if len(old_files) + 1 >= self._threshold(pid):
                parts = [
                    pq.read_table(os.path.join(self.table_dir, f))
                    for f in old_files
                ]
                rows = pa.concat_tables(
                    [cast_table(t, self.snapshot_schema) for t in parts] + [rows],
                    promote_options="none",
                )
                rel, nbytes = self._write(rows, pid, "append")
                return _stats_row(
                    pid, rows.num_rows, True, nbytes,
                    n_applied, 0, max_lsn, rel, [rel], t0, ev_max, ev_late,
                    self._zjson(rel, rows),
                )
            rel, nbytes = self._write(rows, pid, "append")
            return _stats_row(
                pid,
                int(meta.get("rows", 0)) + n_applied,
                True,
                int(meta.get("bytes", 0)) + nbytes,
                n_applied, 0, max_lsn, rel, old_files + [rel], t0,
                ev_max, ev_late,
                self._zjson(rel, rows),
            )

        # Bootstrap: an empty partition's first write IS its compacted state —
        # write a clean snapshot directly (same write cost as a delta, and the
        # initial backfill then needs no compaction pass at all). Deltas only
        # make sense once a base exists to avoid rewriting.
        delta_ok = (
            self.write_mode == "delta"
            and bool(old_files)
            and len(old_files) + 1 < self._threshold(pid)
        )

        if self.mode == "sum":
            # SummingMergeTree-analog: insert-only additive deltas (normalize
            # rejects u/d ops). The group is partial-summed here; the delta
            # path appends the partial (O(changes) per epoch, same LSM shape
            # as upsert deltas), the compact path folds the whole chain.
            rows = changes.drop_columns(
                [c for c in ("op", *ROUTING_COLS) if c in changes.column_names]
            )
            compacted = sum_compact(
                cast_table(rows, self.snapshot_schema), sum_cols=self.sum_cols
            )
            if delta_ok:
                rel, nbytes = self._write(compacted, pid, "delta")
                chain_bytes = int(meta.get("bytes", 0)) + nbytes
                return _stats_row(
                    pid, int(meta.get("rows", 0)), False, chain_bytes,
                    n_applied, 0, max_lsn, rel, old_files + [rel], t0,
                    ev_max, ev_late,
                    self._zjson(rel, compacted),
                )
            merged = sum_merge_file_tables(
                self._read_files(meta) + [compacted],
                self.snapshot_schema,
                self.sum_cols,
            )
            rel, nbytes = self._write(merged, pid, "snapshot")
            return _stats_row(
                pid, merged.num_rows, True, nbytes,
                n_applied, 0, max_lsn, rel, [rel], t0, ev_max, ev_late,
                self._zjson(rel, merged),
            )
        if self.mode == "collapse":
            # CollapsingMergeTree-analog: insert-only ±1 events, folded to
            # the associative partial encoding (collapse_compact). Delta
            # path appends the partial; compact path folds the chain. The
            # committed state is PARTIAL (residual cancel balances kept);
            # readers finalize (net > 0 filter) — see collapse_compact.
            rows = changes.drop_columns(
                [c for c in ("op", *ROUTING_COLS) if c in changes.column_names]
            )
            compacted = collapse_compact(cast_table(rows, self.snapshot_schema))
            if delta_ok:
                rel, nbytes = self._write(compacted, pid, "delta")
                chain_bytes = int(meta.get("bytes", 0)) + nbytes
                return _stats_row(
                    pid, int(meta.get("rows", 0)), False, chain_bytes,
                    n_applied, 0, max_lsn, rel, old_files + [rel], t0,
                    ev_max, ev_late,
                    self._zjson(rel, compacted),
                )
            merged = collapse_merge_file_tables(
                self._read_files(meta) + [compacted], self.snapshot_schema
            )
            rel, nbytes = self._write(merged, pid, "snapshot")
            return _stats_row(
                pid, merged.num_rows, True, nbytes,
                n_applied, 0, max_lsn, rel, [rel], t0, ev_max, ev_late,
                self._zjson(rel, merged),
            )
        if delta_ok:
            # Append path: compacted change rows only, op + tombstones kept.
            compacted = lww_compact(
                changes.drop_columns(
                    [c for c in ROUTING_COLS if c in changes.column_names]
                )
            )
            op = compacted.column("op")
            delta = cast_table(compacted, self.snapshot_schema).append_column(
                "op", op.cast(pa.string())
            )
            rel, nbytes = self._write(delta, pid, "delta")
            # bytes = whole live chain (old parts + new delta), so manifest
            # byte accounting stays consistent with the files list while
            # deltas are pending (it was just the last delta's size before).
            chain_bytes = int(meta.get("bytes", 0)) + nbytes
            return _stats_row(
                pid, int(meta.get("rows", 0)), False, chain_bytes,
                n_applied, n_del, max_lsn, rel, old_files + [rel], t0,
                ev_max, ev_late,
                self._zjson(rel, delta),
            )

        # Compaction / snapshot path: full merge of the file chain + changes.
        base_tables = self._read_files(meta)
        changes = changes.drop_columns(
            [c for c in ROUTING_COLS if c in changes.column_names]
        )
        # merge_file_tables output is already doc_id-sorted (lww_compact
        # emits winners in key order) — no extra payload sort needed
        merged = merge_file_tables(base_tables + [changes], self.snapshot_schema)
        rel, nbytes = self._write(merged, pid, "snapshot")
        return _stats_row(
            pid, merged.num_rows, True, nbytes,
            n_applied, n_del, max_lsn, rel, [rel], t0, ev_max, ev_late,
            self._zjson(rel, merged),
        )


class CompactWorker:
    """Major compaction: fold one partition's delta chain into a single clean
    snapshot file (the write-time half of MERGE-on-read; analog of a manual
    ``OPTIMIZE TABLE ... FINAL`` on a ReplacingMergeTree). Runs as an actor
    pool over pid-descriptor rows; same tmp-write + driver-rename commit
    protocol as MergeApply."""

    def __init__(
        self,
        table_dir: str,
        epoch: int,
        partitions: dict[str, dict],
        snapshot_schema_b64: str,
        mode: str = "upsert",
        sum_cols: list[str] | tuple = (),
        skip_cols: list[str] | tuple = (),
    ):
        self.table_dir = table_dir
        self.epoch = epoch
        self.partitions = partitions
        self.snapshot_schema = schema_from_b64(snapshot_schema_b64)
        self.mode = mode
        self.sum_cols = list(sum_cols)
        self.skip_cols = list(skip_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        kind = "append" if self.mode == "append" else "snapshot"
        for pid in batch.column("pid").to_pylist():
            t0 = time.perf_counter()
            files = self.partitions[str(pid)].get("files") or []
            # read_partition output is doc_id-sorted (clean snapshots are
            # stored sorted; merge_file_tables emits winners in key order);
            # append chains concat in lsn order — both deterministic.
            merged = read_partition(
                self.table_dir, files, self.snapshot_schema, self.mode,
                self.sum_cols,
            )
            rel, nbytes = write_part_tmp(
                self.table_dir, pid, self.epoch, kind, merged
            )
            meta = self.partitions[str(pid)]
            zj = (
                json.dumps({rel: column_zones(merged, self.skip_cols)})
                if self.skip_cols
                else ""
            )
            out.append(
                _stats_row(
                    pid, merged.num_rows, True, nbytes,
                    0, 0, int(meta["watermark_lsn"]), rel, [rel], t0,
                    zones_json=zj,
                )
            )
        return pa.concat_tables(out)


class TTLWorker:
    """TTL expiration rewrite: fold one partition's file chain (LWW-merged
    for upsert tables, concatenated for append tables) and DROP rows whose
    TTL column is strictly before the cutoff — the merge-time half of
    ClickHouse's ``TTL <col>`` clause (rows past their TTL disappear when a
    part is rewritten), run as an explicit maintenance pass. Null TTL values
    never expire (ClickHouse semantics). Same tmp-write + driver-rename
    commit protocol as MergeApply/CompactWorker; the driver handles the
    cheap cases (whole-partition drops on time-partitioned tables, footer
    min-stat pruning) so this worker only ever sees partitions that really
    contain expired rows."""

    def __init__(
        self,
        table_dir: str,
        epoch: int,
        partitions: dict[str, dict],
        snapshot_schema_b64: str,
        ttl_col: str,
        cutoff_us: int,
        mode: str = "upsert",
        sum_cols: list[str] | tuple = (),
        skip_cols: list[str] | tuple = (),
    ):
        self.table_dir = table_dir
        self.epoch = epoch
        self.partitions = partitions
        self.snapshot_schema = schema_from_b64(snapshot_schema_b64)
        self.ttl_col = ttl_col
        self.cutoff_us = cutoff_us
        self.mode = mode
        self.sum_cols = list(sum_cols)
        self.skip_cols = list(skip_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        kind = "append" if self.mode == "append" else "snapshot"
        for pid in batch.column("pid").to_pylist():
            t0 = time.perf_counter()
            meta = self.partitions[str(pid)]
            merged = read_partition(
                self.table_dir, meta.get("files") or [], self.snapshot_schema,
                self.mode, self.sum_cols,
            )
            col = merged.column(self.ttl_col)
            cutoff = pa.scalar(self.cutoff_us, pa.timestamp("us")).cast(col.type)
            # keep = ttl_col >= cutoff; nulls keep (never expire)
            keep = pc.fill_null(pc.greater_equal(col, cutoff), True)
            if self.mode == "collapse":
                # an expiring winner must take its key's adjustment rows
                # with it: adjustments carry null payloads (null TTL never
                # expires), so leaving them would turn a revivable cancelled
                # key (net 0) into an unrevivable one (net -1). Drop the
                # WHOLE key when its winner row expires; winnerless
                # adjustment keys have no TTL value and persist until a
                # mutation removes them (documented semantics).
                sign = merged.column("sign")
                ver = merged.column("lsn")
                winner_mask = pc.and_(
                    pc.fill_null(
                        pc.greater(sign, pa.scalar(0).cast(sign.type)), False
                    ),
                    pc.is_valid(ver),
                )
                expired_keys = merged.filter(
                    pc.and_(winner_mask, pc.invert(keep))
                ).column("doc_id")
                if len(expired_keys):
                    keep = pc.and_(
                        keep,
                        pc.invert(
                            pc.is_in(
                                merged.column("doc_id"),
                                value_set=expired_keys.combine_chunks(),
                            )
                        ),
                    )
            kept = merged.filter(keep)
            expired = merged.num_rows - kept.num_rows
            rel, nbytes = write_part_tmp(self.table_dir, pid, self.epoch, kind, kept)
            zj = (
                json.dumps({rel: column_zones(kept, self.skip_cols)})
                if self.skip_cols
                else ""
            )
            out.append(
                _stats_row(
                    pid, kept.num_rows, True, nbytes,
                    0, expired, int(meta["watermark_lsn"]), rel, [rel], t0,
                    zones_json=zj,
                )
            )
        return pa.concat_tables(out)


class MutateWorker:
    """Predicate mutation rewrite: the ClickHouse ``ALTER TABLE ... DELETE
    WHERE`` / ``UPDATE ... WHERE`` mutation analog — fold one partition's
    chain (LWW for upsert, sum-fold for sum, concat for append) and either
    DROP the rows matching a range predicate or overwrite their ``set_cols``
    with constants. Runs only on partitions the driver could not prune by
    skip-index zones; a partition whose merged state matches NOTHING returns
    its original chain untouched (``new_file=""``) so an unselective
    mutation costs reads, never writes. Same tmp-write + driver-rename
    commit protocol as MergeApply/TTLWorker."""

    def __init__(
        self,
        table_dir: str,
        epoch: int,
        partitions: dict[str, dict],
        snapshot_schema_b64: str,
        col: str,
        lo=None,
        hi=None,
        delete: bool = False,
        set_cols: dict | None = None,
        mode: str = "upsert",
        sum_cols: list[str] | tuple = (),
        skip_cols: list[str] | tuple = (),
    ):
        self.table_dir = table_dir
        self.epoch = epoch
        self.partitions = partitions
        self.snapshot_schema = schema_from_b64(snapshot_schema_b64)
        self.col = col
        self.lo = lo
        self.hi = hi
        self.delete = delete
        self.set_cols = dict(set_cols or {})
        self.mode = mode
        self.sum_cols = list(sum_cols)
        self.skip_cols = list(skip_cols)

    def _mask(self, t: pa.Table) -> pa.Array:
        c = t.column(self.col)
        mask = None
        if self.lo is not None:
            mask = pc.greater_equal(c, pa.scalar(self.lo).cast(c.type))
        if self.hi is not None:
            m2 = pc.less_equal(c, pa.scalar(self.hi).cast(c.type))
            mask = m2 if mask is None else pc.and_(mask, m2)
        # nulls never match a range predicate (SQL semantics)
        return pc.fill_null(mask, False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        kind = "append" if self.mode == "append" else "snapshot"
        for pid in batch.column("pid").to_pylist():
            t0 = time.perf_counter()
            meta = self.partitions[str(pid)]
            files = list(meta.get("files") or [])
            merged = read_partition(
                self.table_dir, files, self.snapshot_schema, self.mode,
                self.sum_cols,
            )
            mask = self._mask(merged)
            n_hit = pc.sum(mask.cast(pa.int64())).as_py() or 0
            if n_hit == 0:
                # zone said "maybe" but the merged state says no: leave the
                # chain alone (rows/bytes/files unchanged, nothing written)
                out.append(
                    _stats_row(
                        pid, int(meta.get("rows", 0)),
                        bool(meta.get("exact_rows", True)),
                        int(meta.get("bytes", 0)), 0, 0,
                        int(meta["watermark_lsn"]), "", files, t0,
                    )
                )
                continue
            if self.delete:
                result = merged.filter(pc.invert(mask))
                n_del, n_upd = n_hit, 0
            else:
                result = merged
                for name, value in self.set_cols.items():
                    idx = result.schema.get_field_index(name)
                    col = result.column(name)
                    sv = pa.scalar(value).cast(col.type)
                    new = pc.if_else(mask, sv, col)
                    result = result.set_column(idx, result.schema.field(idx), new)
                n_del, n_upd = 0, n_hit
            rel, nbytes = write_part_tmp(
                self.table_dir, pid, self.epoch, kind, result
            )
            zj = (
                json.dumps({rel: column_zones(result, self.skip_cols)})
                if self.skip_cols
                else ""
            )
            out.append(
                _stats_row(
                    pid, result.num_rows, True, nbytes,
                    n_upd, n_del, int(meta["watermark_lsn"]), rel, [rel], t0,
                    zones_json=zj,
                )
            )
        return pa.concat_tables(out)


class SnapshotWriter:
    """Write one pid group of already-merged snapshot rows as a clean
    snapshot file (used by table repartitioning, where rows arrive via a
    shuffle rather than a file chain). Same tmp-write commit protocol."""

    def __init__(
        self,
        table_dir: str,
        epoch: int,
        snapshot_schema_b64: str,
        check_unique: bool = False,
        skip_cols: list[str] | tuple = (),
    ):
        self.table_dir = table_dir
        self.epoch = epoch
        self.snapshot_schema = schema_from_b64(snapshot_schema_b64)
        self.check_unique = check_unique
        self.skip_cols = list(skip_cols)

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        pid = group.column("pid")[0].as_py()
        rows = group.drop_columns(
            [c for c in ROUTING_COLS if c in group.column_names]
        )
        rows = cast_table(rows, self.snapshot_schema).sort_by(
            [("doc_id", "ascending")]
        )
        dup_sample: list = []
        if self.check_unique and rows.num_rows > 1:
            # Bulk import has no LSN order to break ties with, so duplicate
            # keys would silently produce a non-unique "clean" snapshot —
            # detect them here (vectorized adjacent-equal on sorted keys) and
            # REPORT via the stats row; the DRIVER raises before committing.
            # (Raising inside the actor would poison the session: Ray Data's
            # failure path leaks the pool's actors + their CPUs, observed
            # deadlocking later datasets in a long pytest session.)
            keys = rows.column("doc_id").combine_chunks()
            n = len(keys)
            dup = pc.equal(keys.slice(0, n - 1), keys.slice(1, n - 1))
            n_dup = pc.sum(dup.cast(pa.int64())).as_py() or 0
            if n_dup:
                dup_sample = pc.filter(keys.slice(0, n - 1), dup).slice(0, 5).to_pylist()
        rel, nbytes = write_part_tmp(
            self.table_dir, pid, self.epoch, "snapshot", rows
        )
        zj = (
            json.dumps({rel: column_zones(rows, self.skip_cols)})
            if self.skip_cols
            else ""
        )
        stats = _stats_row(
            pid, rows.num_rows, True, nbytes,
            rows.num_rows, 0, 0, rel, [rel], t0,
            zones_json=zj,
        )
        return stats.append_column(
            "dups_json", pa.array([json.dumps(dup_sample)], pa.string())
        )
