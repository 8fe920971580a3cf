"""WAL segment discovery with LSN-range pruning.

The binlog/CDC tail: a directory of LSN-ordered Parquet segments named
``seg-{first_lsn:012d}-{last_lsn:012d}.parquet`` (contiguous, non-overlapping).
Segment names carry the watermark predicate, so incremental scans
(the analog of the reference's ``updated_at > since`` extraction,
/root/reference/etl/core/pipeline.py:17-51, and of Kafka offset seeks,
/root/reference/stream_etl/core/consumer.py:86-109) never even *open*
already-applied segments — pushdown at the file-listing level.

Scale shape (10^10 events): segments may live flat in the WAL dir or inside
LSN-named shard subdirectories (``shard-{first_lsn:012d}/``). Shard dirs make
the per-epoch listing O(shards + segments in unapplied shards): a shard whose
entire LSN range is at or below the watermark is skipped WITHOUT listing its
contents (a shard's range ends where the next shard begins), so a
million-segment retained WAL costs one readdir of shard names per epoch, not
a million stats. ``truncate_wal`` (log retention) keeps the live set bounded
and removes emptied shard dirs.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

# Parquet is the native WAL format; JSONL is accepted for interop with
# JSON-emitting CDC sources (Debezium's wire format is JSON — the reference
# consumes exactly that, /root/reference/stream_etl/core/consumer.py:48).
# {:012d} zero-pads up to 10^12 and grows naturally past it, so the match
# must accept >=12 digits — a fixed {12} would make segments past lsn 10^12
# invisible to the listing (replay reports "caught up" while events silently
# stop applying). Ordering never relies on name width: listings sort by the
# PARSED integers.
SEG_RE = re.compile(r"^seg-(\d{12,})-(\d{12,})\.(parquet|jsonl)$")
SHARD_RE = re.compile(r"^shard-(\d{12,})$")


@dataclass(frozen=True)
class Segment:
    first_lsn: int
    last_lsn: int
    path: str

    @property
    def name(self) -> str:
        return os.path.basename(self.path)

    @property
    def format(self) -> str:
        return "jsonl" if self.path.endswith(".jsonl") else "parquet"


def segment_path(wal_dir: str, first_lsn: int, last_lsn: int) -> str:
    return os.path.join(wal_dir, f"seg-{first_lsn:012d}-{last_lsn:012d}.parquet")


def _scan_dir(d: str, segs: list[Segment]) -> None:
    for name in os.listdir(d):
        m = SEG_RE.match(name)
        if m:
            segs.append(Segment(int(m.group(1)), int(m.group(2)), os.path.join(d, name)))


def list_segments(wal_dir: str, skip_upto: int = 0) -> list[Segment]:
    """All WAL segments (flat files + shard subdirs), LSN-sorted and
    validated non-overlapping. ``skip_upto`` is the listing-level pruning
    hook: a shard dir whose entire range is ≤ skip_upto is skipped without
    even listing its contents (its range ends where the next shard starts).

    Shard-range CONTRACT (hard, on the WAL producer): every segment inside
    ``shard-{S}/`` must satisfy S ≤ first_lsn and last_lsn < next shard's
    start. Pruning a shard without listing it is only sound under this
    contract; it is therefore AUDITED wherever it can be checked cheaply —
    every shard that IS listed is validated against its range, so any full
    listing (skip_upto=0, e.g. create-time scans and ``truncate_wal``)
    audits the whole WAL, and a replay fails loudly on the first violating
    shard it opens rather than silently never applying a misplaced
    segment."""
    segs: list[Segment] = []
    shards: list[tuple[int, str]] = []
    for name in os.listdir(wal_dir):
        m = SHARD_RE.match(name)
        if m:
            shards.append((int(m.group(1)), os.path.join(wal_dir, name)))
    _scan_dir(wal_dir, segs)
    shards.sort()
    for i, (first, path) in enumerate(shards):
        nxt = shards[i + 1][0] if i + 1 < len(shards) else None
        if nxt is not None and nxt - 1 <= skip_upto:
            continue  # whole shard ≤ watermark: never listed
        before = len(segs)
        _scan_dir(path, segs)
        for s in segs[before:]:
            if s.first_lsn < first or (nxt is not None and s.last_lsn >= nxt):
                raise ValueError(
                    f"segment {s.name} (lsn {s.first_lsn}-{s.last_lsn}) violates "
                    f"shard range [{first}, {nxt if nxt is not None else 'inf'}) of "
                    f"{os.path.basename(path)} — misplaced segments would be "
                    f"silently skipped by watermark pruning"
                )
    segs.sort(key=lambda s: s.first_lsn)
    for a, b in zip(segs, segs[1:]):
        if b.first_lsn <= a.last_lsn:
            raise ValueError(f"overlapping WAL segments: {a.name} / {b.name}")
    return segs


def pending_segments(
    wal_dir: str, watermark: int, max_segments: int | None = None
) -> list[Segment]:
    """Segments containing any LSN > watermark, in LSN order (whole shard
    dirs below the watermark are pruned at the listing)."""
    segs = [s for s in list_segments(wal_dir, skip_upto=watermark) if s.last_lsn > watermark]
    # None = unlimited; 0 is a real cap (a dynamic backpressure budget can
    # legitimately reach zero) — `if max_segments` would read 0 as unlimited
    return segs if max_segments is None else segs[:max_segments]


def truncate_wal(wal_dir: str, watermark_lsn: int) -> list[str]:
    """Log retention: delete segments fully applied at ``watermark_lsn``
    (every event ≤ the watermark is durably in the table, so the segments are
    dead weight — the binlog-purge analog of `PURGE BINARY LOGS`, a concern
    the reference leaves to Kafka retention). Only whole segments at or below
    the watermark are removed; a segment straddling it stays (its unapplied
    tail is still needed; re-applying its applied prefix is idempotent).
    Emptied shard dirs are removed too. Returns the removed file names."""
    removed = []
    for seg in list_segments(wal_dir):
        if seg.last_lsn <= watermark_lsn:
            os.remove(seg.path)
            removed.append(seg.name)
    for name in os.listdir(wal_dir):
        if SHARD_RE.match(name):
            path = os.path.join(wal_dir, name)
            if not os.listdir(path):
                os.rmdir(path)
    return removed


def segment_schema(seg: Segment):
    """Arrow schema of one segment. Parquet: from the footer (cheap). JSONL:
    inferred from a head sample, with fields that exist in the canonical
    change schema conformed to their canonical types (JSON integers all infer
    as int64; conforming avoids spuriously widening the table schema every
    time a JSON segment appears).

    JSONL segments must be schema-homogeneous per file (every line carries the
    same keys) — the epoch schema for the file is taken from its first full
    line; the sample grows until at least one complete line is captured, so an
    oversized first record (fat payloads) can never be parsed truncated."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if seg.format == "parquet":
        return pq.read_schema(seg.path)
    import pyarrow.json as pj

    from ..schemas import CHANGE_SCHEMA

    sample = 1 << 16
    while True:
        with open(seg.path, "rb") as f:
            head = f.read(sample)
        if len(head) < sample:
            break  # whole file read — parse as-is
        nl = head.rfind(b"\n")
        if nl >= 0:
            head = head[: nl + 1]
            break
        sample *= 4  # first line longer than the sample — grow until complete
    inferred = pj.read_json(pa.py_buffer(head)).schema
    fields = []
    for field in inferred:
        idx = CHANGE_SCHEMA.get_field_index(field.name)
        fields.append(CHANGE_SCHEMA.field(idx) if idx >= 0 else field)
    return pa.schema(fields)


def segment_num_rows(seg: Segment) -> int:
    """Event count of one segment (parquet metadata / JSONL line count —
    equivalently, last_lsn - first_lsn + 1 since segments are dense)."""
    return seg.last_lsn - seg.first_lsn + 1
