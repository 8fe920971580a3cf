"""Per-partition high-watermark manifest: the engine's durable state.

Replaces the reference's two watermark mechanisms — the *in-memory*
``last_sync`` dict that is lost on restart (/root/reference/etl/core/
pipeline.py:197-202, reset at /root/reference/etl/main.py:116-119) and the
Kafka consumer-group offsets (/root/reference/stream_etl/core/consumer.py:
103-105) — with a single JSON manifest per table holding, per partition:
the high watermark (max applied LSN), current snapshot files, row/byte
counts, and applied-segment lineage.

Commit protocol (exactly-once, the fix for the reference's at-least-once
delivery): merge workers write ``*.parquet.tmp`` files; the driver renames
them all, then atomically replaces ``manifest.json`` (single ``os.replace``).
A crash anywhere before that replace leaves the previous manifest authoritative
and the epoch invisible; re-running is idempotent (same segments re-read, same
deterministic bytes rewritten). Driver state is O(P + epochs), never O(keys)
— the 10^10-event design point.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import pyarrow as pa

from ..schemas import schema_from_b64, schema_to_b64
from .store import (
    ConcurrentCommitError,  # noqa: F401  (re-export: callers catch it here)
    mark_object_store,
    put_json_if_absent,
    put_json_object,
    store_kind,
)

MANIFEST_NAME = "manifest.json"
# Retained versioned manifests (time travel): manifest-{epoch:06d}.json.
MANIFEST_RETENTION = 8


@dataclass
class Manifest:
    table_dir: str
    num_partitions: int
    schema_b64: str
    epoch: int = 0
    # pid (as str, JSON-friendly) -> {watermark_lsn, rows, bytes, files, lineage}
    partitions: dict[str, dict] = field(default_factory=dict)
    # bounded per-epoch metrics history (events applied, wall seconds, ...)
    history: list[dict] = field(default_factory=list)
    # pid -> change rows applied in the LAST committed epoch. Used for
    # shuffle-free hot-partition prediction: skew in CDC streams is sticky
    # (hot sources stay hot), so last epoch's histogram decides this epoch's
    # salting without an extra counting pass over the data. O(P).
    last_applied: dict[str, int] = field(default_factory=dict)
    updated_at: float = 0.0
    # Write discipline (the reference's table engines,
    # /root/reference/etl/clickhouse_schema/init.sql:8-29 vs 32-52, and the
    # SummingMergeTree the reference uses for its kpi views,
    # kpi_views.sql:5-8):
    # "upsert" = ReplacingMergeTree-style LWW keyed by key_col;
    # "append" = MergeTree-style append-only facts (no per-key sort, no
    # tombstones — the cheap fast path for event tables);
    # "sum"    = SummingMergeTree-style additive rollup: insert-only change
    # events fold per key with sum_cols summed and other columns LWW'd.
    mode: str = "upsert"
    key_col: str = "doc_id"
    # measure columns summed per key by sum-mode merges (empty otherwise)
    sum_cols: list[str] = field(default_factory=list)
    # {"kind": "hash", "num": P} (default) or
    # {"kind": "time", "col": <ts col>, "granularity": "month"} — the analog
    # of PARTITION BY toYYYYMM(event_date) (init.sql:40): pid = yyyymm, so
    # date-range reads prune whole partitions at the manifest. Time
    # partitions are created dynamically as new months appear.
    partition_spec: dict = field(default_factory=dict)
    # Resume floor for tables whose partition set is dynamic (time
    # partitioning starts with ZERO partitions); equals every partition's
    # watermark after any commit.
    watermark_floor: int = 0
    # retained versioned manifests for time travel (per-table override of
    # the MANIFEST_RETENTION default)
    retention: int = MANIFEST_RETENTION
    # EVENT-TIME watermark (late-data accounting, §2.9 streaming concerns):
    # when set, every epoch tracks max(event_time_col) across applied events
    # and counts arrivals whose event time is BEHIND the committed watermark
    # (out-of-order beyond allowed lateness). Processing-time progress is the
    # LSN watermark above; this is the event-time twin (the Flink watermark
    # idea, applied per micro-batch). "" = disabled (doc tables carry no
    # event time).
    event_time_col: str = ""
    # microseconds since epoch; None until the first event is seen
    event_time_watermark_us: int | None = None
    # Data-skipping index columns (ClickHouse `INDEX ... TYPE minmax` analog,
    # declared like the skip indexes a MergeTree DDL would carry): every part
    # write records per-file min/max zones for these columns in the manifest
    # (partitions[pid]["zones"][file][col] = [lo, hi]); `pipelines.scan.
    # read_where` prunes partitions/files whose zones cannot overlap a range
    # predicate BEFORE opening any parquet. [] = no skip index (no zones
    # recorded, scans read everything).
    skip_cols: list[str] = field(default_factory=list)

    @property
    def schema(self) -> pa.Schema:
        return schema_from_b64(self.schema_b64)

    @property
    def spec(self) -> dict:
        return self.partition_spec or {"kind": "hash", "num": self.num_partitions}

    @property
    def watermark(self) -> int:
        """Global resume point = min per-partition watermark (they are equal
        after every atomic commit; min is safe if that invariant ever breaks
        because merge workers re-filter per-pid). Dynamic-partition tables
        fall back to the committed floor while empty."""
        if not self.partitions:
            return self.watermark_floor
        return min(int(p["watermark_lsn"]) for p in self.partitions.values())

    def snapshot_files(self) -> list[str]:
        out: list[str] = []
        for pid in sorted(self.partitions, key=int):
            out.extend(
                os.path.join(self.table_dir, f) for f in self.partitions[pid]["files"]
            )
        return out

    def total_rows(self) -> int:
        return sum(int(p["rows"]) for p in self.partitions.values())


def empty_partition(watermark_lsn: int = 0) -> dict:
    return {"watermark_lsn": watermark_lsn, "rows": 0, "bytes": 0, "files": [], "lineage": []}


def init_table(
    table_dir: str,
    schema: pa.Schema,
    num_partitions: int,
    mode: str = "upsert",
    key_col: str = "doc_id",
    partition_spec: dict | None = None,
    retention: int = MANIFEST_RETENTION,
    event_time_col: str = "",
    sum_cols: list[str] | None = None,
    skip_cols: list[str] | None = None,
    store: str = "posix",
) -> Manifest:
    """Create an empty table layout + manifest v0 (idempotent, the analog of
    the reference's ``CREATE TABLE IF NOT EXISTS`` DDL path,
    /root/reference/etl/core/schema.py:16-24). Hash-partitioned tables
    pre-create their fixed partition set; time-partitioned tables start empty
    (partitions appear as their months do).

    ``store`` picks the commit protocol: ``"posix"`` (rename + flock,
    default) or ``"object"`` (conditional-put manifest swap, no rename/lock
    — see ``state/store.py``). Immutable after creation."""
    if mode not in ("upsert", "append", "sum", "collapse"):
        raise ValueError(
            f"unknown table mode {mode!r} (upsert|append|sum|collapse)"
        )
    if mode == "collapse":
        # CollapsingMergeTree-analog: keyed like upsert/sum, plus a sign
        # column holding +1 (state) / -1 (cancel) on change events and the
        # mergeable net in committed partial state.
        if "doc_id" not in schema.names or key_col != "doc_id":
            raise ValueError(
                "collapse tables are keyed by a physical 'doc_id' column "
                "(rename your key at import/normalize time), like upsert"
            )
        if "sign" not in schema.names or not pa.types.is_integer(
            schema.field("sign").type
        ):
            raise ValueError(
                "collapse tables need an integer 'sign' column "
                f"(got schema {list(schema.names)})"
            )
    if mode == "sum":
        # SummingMergeTree-analog: keyed like upsert (the merge kernels key
        # on the physical doc_id column — same convention, same reason), but
        # additionally needs the measure columns to sum.
        if "doc_id" not in schema.names or key_col != "doc_id":
            raise ValueError(
                "sum tables are keyed by a physical 'doc_id' column "
                "(rename your key at import/normalize time), like upsert"
            )
        if not sum_cols:
            raise ValueError("sum tables need non-empty sum_cols")
        for c in sum_cols:
            if c not in schema.names:
                raise ValueError(f"sum col {c!r} not in schema {list(schema.names)}")
            t = schema.field(c).type
            if not (pa.types.is_integer(t) or pa.types.is_floating(t)):
                raise ValueError(f"sum col {c!r} must be numeric, got {t}")
            if c in ("doc_id", "lsn", key_col):
                raise ValueError(f"sum col {c!r} cannot be the key or lsn")
    elif sum_cols:
        raise ValueError(f"sum_cols only apply to mode='sum' (got mode={mode!r})")
    if mode == "upsert" and "doc_id" not in schema.names:
        # the LWW merge kernels (lww_compact / merge_file_tables) key on the
        # physical doc_id column; import_base renames foreign key columns to
        # it. An upsert table without one would fail deep in the first merge
        # — reject at DDL time instead.
        raise ValueError(
            "upsert tables need a 'doc_id' key column in the schema "
            "(rename your key at import/normalize time); got "
            f"{list(schema.names)}"
        )
    if mode == "upsert" and key_col != "doc_id":
        # half the pipeline (normalize pre-compaction, partition hashing)
        # honors key_col while the merge kernels key on the physical doc_id;
        # an upsert table keyed elsewhere would get batch-boundary-dependent
        # LWW (nondeterministic row loss). The engine convention: upsert keys
        # are ALWAYS physically named doc_id (import_base renames); key_col
        # is a real choice only for append tables (e.g. event_id facts).
        raise ValueError(
            f"upsert tables must use key_col='doc_id' (got {key_col!r}); "
            "rename the key column at import/normalize time instead"
        )
    for c in skip_cols or []:
        if c not in schema.names:
            raise ValueError(f"skip col {c!r} not in schema {list(schema.names)}")
        t = schema.field(c).type
        if not (
            pa.types.is_integer(t)
            or pa.types.is_floating(t)
            or pa.types.is_timestamp(t)
            or pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_date(t)
        ):
            raise ValueError(
                f"skip col {c!r} must be orderable scalar "
                f"(int/float/timestamp/date/string), got {t}"
            )
    spec = partition_spec or {"kind": "hash", "num": num_partitions}
    if spec.get("kind") == "hash" and int(spec.get("num", num_partitions)) != num_partitions:
        # the write path routes by spec['num'] while readers size loops by
        # num_partitions — a mismatch would make point lookups silently miss
        raise ValueError(
            f"hash partition_spec num ({spec.get('num')}) must equal "
            f"num_partitions ({num_partitions})"
        )
    if store not in ("posix", "object"):
        raise ValueError(f"unknown store {store!r} (posix|object)")
    if store == "object":
        # marker precedes the first commit so every subsequent read/commit
        # dispatches to the conditional-put protocol
        mark_object_store(table_dir)
    existing = os.path.join(table_dir, MANIFEST_NAME)
    if os.path.exists(existing) or (
        store_kind(table_dir) == "object" and retained_epochs(table_dir)
    ):
        # idempotent re-create; the object-mode pointer may lag the
        # committed versions (crash between version PUT and pointer PUT)
        return load_manifest(table_dir)
    os.makedirs(os.path.join(table_dir, "parts"), exist_ok=True)
    partitions = (
        {str(pid): empty_partition() for pid in range(num_partitions)}
        if spec.get("kind") == "hash"
        else {}
    )
    man = Manifest(
        table_dir=table_dir,
        num_partitions=num_partitions,
        schema_b64=schema_to_b64(schema),
        partitions=partitions,
        mode=mode,
        key_col=key_col,
        partition_spec=spec,
        retention=max(1, retention),
        event_time_col=event_time_col,
        sum_cols=list(sum_cols or []),
        skip_cols=list(skip_cols or []),
    )
    commit_manifest(man)
    return man


def load_manifest(table_dir: str, epoch: int | None = None) -> Manifest:
    """Load the current manifest, or a retained historical one (time travel:
    every commit also writes ``manifest-{epoch:06d}.json`` and keeps the last
    ``MANIFEST_RETENTION`` of them; file GC preserves any file referenced by
    a retained manifest, so historical snapshots stay readable — the
    Iceberg/Delta snapshot-isolation idea on the same atomic-swap commit).

    Object-store tables resolve the CURRENT manifest by listing versioned
    manifests and reading the max — ``manifest.json`` is only a pointer
    there and may lag a crash between the version PUT (the commit point)
    and the pointer PUT."""
    name = MANIFEST_NAME if epoch is None else f"manifest-{epoch:06d}.json"
    if epoch is None and store_kind(table_dir) == "object":
        eps = retained_epochs(table_dir)
        if eps:
            name = f"manifest-{eps[-1]:06d}.json"
    try:
        with open(os.path.join(table_dir, name)) as f:
            doc = json.load(f)
    except FileNotFoundError:
        if epoch is not None:
            raise ValueError(
                f"epoch {epoch} is not retained (retention="
                f"{MANIFEST_RETENTION}); available: {retained_epochs(table_dir)}"
            ) from None
        raise
    return Manifest(
        table_dir=table_dir,
        num_partitions=doc["num_partitions"],
        schema_b64=doc["schema_b64"],
        epoch=doc["epoch"],
        partitions=doc["partitions"],
        history=doc.get("history", []),
        last_applied=doc.get("last_applied", {}),
        updated_at=doc.get("updated_at", 0.0),
        mode=doc.get("mode", "upsert"),
        key_col=doc.get("key_col", "doc_id"),
        sum_cols=doc.get("sum_cols", []),
        partition_spec=doc.get("partition_spec", {}),
        watermark_floor=doc.get("watermark_floor", 0),
        retention=doc.get("retention", MANIFEST_RETENTION),
        event_time_col=doc.get("event_time_col", ""),
        event_time_watermark_us=doc.get("event_time_watermark_us"),
        skip_cols=doc.get("skip_cols", []),
    )


def atomic_json_write(path: str, doc: dict, fsync_dir: bool = True) -> None:
    """THE atomic JSON commit (manifest, registry, MV specs all use it):
    pid-suffixed tmp name (two concurrent writers never interleave bytes in
    one tmp file), content fsync, atomic rename, parent-directory fsync (the
    rename itself must be durable before anything references the file)."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(doc, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    if fsync_dir:
        dfd = os.open(os.path.dirname(os.path.abspath(path)), os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)


def commit_manifest(man: Manifest, allow_overwrite_version: bool = False) -> None:
    """Atomic manifest swap (posix: tmp write + fsync + os.replace; object
    store: conditional PUT of the versioned manifest — see state/store.py).

    ``allow_overwrite_version`` is the fsck-repair escape hatch: repairs
    persist metadata fixes at the SAME epoch, which on an object store means
    overwriting an existing versioned manifest instead of the normal
    put-if-absent commit. Maintenance-only; every epoch-advancing commit
    must leave it False so racing writers keep losing loudly."""
    man.updated_at = time.time()
    doc = {
        "version": 2,
        "num_partitions": man.num_partitions,
        "schema_b64": man.schema_b64,
        "epoch": man.epoch,
        "partitions": man.partitions,
        "history": man.history[-50:],
        "last_applied": man.last_applied,
        "updated_at": man.updated_at,
        "mode": man.mode,
        "key_col": man.key_col,
        "sum_cols": man.sum_cols,
        "partition_spec": man.partition_spec,
        "watermark_floor": man.watermark_floor,
        "retention": man.retention,
        "event_time_col": man.event_time_col,
        "event_time_watermark_us": man.event_time_watermark_us,
        "skip_cols": man.skip_cols,
    }
    path = os.path.join(man.table_dir, MANIFEST_NAME)
    versioned = os.path.join(man.table_dir, f"manifest-{man.epoch:06d}.json")
    if store_kind(man.table_dir) == "object":
        # object-store protocol: the CONDITIONAL PUT of the immutable
        # versioned manifest IS the commit point (exactly one of N racing
        # writers wins — the Delta/Iceberg metadata swap); the current
        # pointer is a best-effort overwrite PUT readers don't rely on.
        # No os.replace, no flock anywhere on this path.
        if allow_overwrite_version:
            put_json_object(versioned, doc)
        else:
            put_json_if_absent(versioned, doc)
        put_json_object(path, doc)
    else:
        # posix protocol: versioned copy first (readable only once the swap
        # lands), then the atomic rename swap that makes this epoch current;
        # both writes fsync content and directory (a power loss must not
        # resurface the previous manifest after the caller reported the
        # epoch committed — parts are fsynced before this, see
        # stages/merge.py write_part_tmp / promote_part)
        atomic_json_write(versioned, doc, fsync_dir=False)
        atomic_json_write(path, doc)
    for old in retained_epochs(man.table_dir)[: -man.retention]:
        os.remove(os.path.join(man.table_dir, f"manifest-{old:06d}.json"))


def retained_epochs(table_dir: str) -> list[int]:
    """Epochs with a retained versioned manifest, ascending."""
    out = []
    for name in os.listdir(table_dir):
        if name.startswith("manifest-") and name.endswith(".json"):
            out.append(int(name[len("manifest-"):-len(".json")]))
    return sorted(out)


def gc_stale_files(man: Manifest, min_age_s: float = 0.0) -> int:
    """Remove snapshot/tmp files referenced by NO retained manifest (fully
    dead epochs, leftover tmps from crashed runs). Files still referenced by
    a retained historical manifest survive so time-travel reads keep working.
    Returns count removed.

    ``min_age_s`` is the object-store grace period (the Delta VACUUM
    retention idea): with optimistic concurrency a racing writer may have
    live *uncommitted* parts on disk, so object-mode auto-GC only removes
    unreferenced files older than the grace window. Posix tables hold the
    flock while writing, so 0 is safe there."""
    import time as _time

    now = _time.time()
    live = {os.path.join(man.table_dir, f) for p in man.partitions.values() for f in p["files"]}
    for ep in retained_epochs(man.table_dir):
        try:
            hist = load_manifest(man.table_dir, epoch=ep)
        except (ValueError, FileNotFoundError):
            continue
        live |= {
            os.path.join(man.table_dir, f)
            for p in hist.partitions.values()
            for f in p["files"]
        }
    removed = 0
    parts_root = os.path.join(man.table_dir, "parts")
    for root, _dirs, names in os.walk(parts_root):
        for name in names:
            path = os.path.join(root, name)
            if path not in live:
                if min_age_s > 0:
                    try:
                        if now - os.path.getmtime(path) < min_age_s:
                            continue
                    except OSError:
                        continue
                os.remove(path)
                removed += 1
    return removed


class TableLockError(RuntimeError):
    """Another live process is committing to this table."""


class table_lock:
    """Single-writer advisory lock via ``flock`` on a permanent lock file.
    The commit protocol assumes one driver per table — two concurrent epochs
    would silently last-write-win the manifest swap and orphan one epoch's
    files.

    ``flock`` is owned by the open fd, so the kernel releases it the instant
    a crashed owner dies — no staleness judgment, no reclaim, and none of
    the TOCTOU holes the previous pid-file scheme had (an empty just-created
    pid file read as "dead", or a reclaim rename stealing a racer's freshly
    acquired live lock). The file itself is never unlinked: unlink+recreate
    would let two processes flock DIFFERENT inodes at the same path. The
    owner pid is written into the file for diagnostics only.

    Scope: correct for a single node (the sandbox; the driver runs one
    process per table). On a multi-node deployment the single-writer claim
    moves to the coordination layer that launches drivers (the same place
    the reference's docker-compose implicitly puts it — it has NO guard and
    runs concurrent batch + streaming writers against the same ClickHouse
    tables, /root/reference/docker-compose.yaml).

    OBJECT-STORE tables skip the lock entirely (object stores have no
    advisory locks): concurrency there is optimistic — racing writers both
    run, and the conditional-put manifest swap picks exactly one winner;
    the loser raises ConcurrentCommitError and retries from fresh state.
    """

    def __init__(self, table_dir: str):
        self.path = os.path.join(table_dir, "table.lock")
        self.fd = None
        self._object = store_kind(table_dir) == "object"

    def __enter__(self):
        if self._object:
            return self
        import fcntl

        fd = os.open(self.path, os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            os.close(fd)
            raise TableLockError(
                f"table is locked by a live writer ({self.path})"
            ) from None
        self.fd = fd
        os.ftruncate(fd, 0)
        os.write(fd, str(os.getpid()).encode())
        return self

    def __exit__(self, *exc):
        import fcntl

        if self.fd is not None:
            os.ftruncate(self.fd, 0)
            fcntl.flock(self.fd, fcntl.LOCK_UN)
            os.close(self.fd)
            self.fd = None
        return False
