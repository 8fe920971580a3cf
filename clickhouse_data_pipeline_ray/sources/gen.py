"""Deterministic CDC change-log generator (the workload model).

Re-expresses the reference's seeder workload over the tokenized-sequence
payload: batch seed = parents-before-children bulk inserts
(/root/reference/seeder/seed.py:110-143) → here a pure-insert base prefix of
the log; periodic seed = 30% insert / 70% update mix against existing keys
(/root/reference/seeder/periodic_seed.py:101) → here a configurable c/u/d mix
(deletes added per the north rule; the reference drops them,
/root/reference/stream_etl/core/processor.py:214-217). The reference picks
update targets uniformly (periodic_seed.py:120); we add Zipf key-skew and a
hot-source knob to exercise salting.

Everything is seeded and segment-local: segment i is a pure function of
(params, i, plan), so generation parallelizes over Ray tasks and replays are
bit-reproducible. Output: ``seg-{first:012d}-{last:012d}.parquet`` files with
dense, globally unique LSNs from 1.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, replace

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schemas import CHANGE_SCHEMA, EVOLVED_CHANGE_SCHEMA
from .wal import segment_path

SOURCES = ("web", "books", "code", "wiki", "chat")
SOURCE_CUMW = np.cumsum((0.5, 0.2, 0.15, 0.1, 0.05))
LANGS = ("en", "de", "zh")


@dataclass(frozen=True)
class GenParams:
    total_events: int = 5_000
    base_events: int = 1_000          # pure-insert prefix ("full load")
    events_per_segment: int = 2_000
    mix: tuple[float, float, float] = (0.3, 0.6, 0.1)  # c/u/d after the base
    seed: int = 42
    zipf_a: float = 1.5               # update/delete target key skew
    hot_frac: float = 0.5             # fraction of updates forced onto SOURCES[0]
    tok_min: int = 8
    tok_max: int = 512
    vocab: int = 50_257
    evolve_frac: float | None = None  # fraction of log after which schema evolves
    # "parquet" (native) or "jsonl" (interop: Debezium-style JSON event lines)
    fmt: str = "parquet"
    # group this many segments per LSN-named shard dir (shard-{first:012d}/);
    # None = flat layout. Shards keep per-epoch listings O(unapplied) at
    # million-segment WALs (see sources/wal.py).
    segments_per_shard: int | None = None


@dataclass(frozen=True)
class SegPlan:
    index: int
    first_lsn: int
    n_c: int
    n_u: int
    n_d: int
    n_before: int   # keys inserted before this segment
    evolved: bool

    @property
    def n(self) -> int:
        return self.n_c + self.n_u + self.n_d


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def source_index_of(key_idx: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic source per key index — lets segment tasks resolve any
    key's source without coordination (no shared key table)."""
    with np.errstate(over="ignore"):
        salt = np.uint64((seed * 0x5851F42D4C957F2D) % (1 << 64))
        z = _splitmix64(key_idx.astype(np.uint64) ^ salt)
    u = z.astype(np.float64) / float(2**64)
    return np.searchsorted(SOURCE_CUMW, u, side="right").clip(0, len(SOURCES) - 1)


def plan_segments(params: GenParams) -> list[SegPlan]:
    """Driver-side plan: per-segment op counts + cumulative insert totals.

    O(num_segments) work/state. (At the 10^10-event design point the plan is
    computed lazily per LSN range, not materialized — each SegPlan is already
    derivable from (params, index) alone given the running insert count.)
    """
    plans: list[SegPlan] = []
    lsn, n_before, i = 1, 0, 0
    remaining = params.total_events
    while remaining > 0:
        n = min(params.events_per_segment, remaining)
        in_base = max(0, min(params.base_events - (lsn - 1), n))
        rest = n - in_base
        rng = np.random.default_rng([params.seed, 500_009 + i])
        if rest > 0 and n_before > 0:
            n_c_r, n_u, n_d = rng.multinomial(rest, params.mix)
        else:  # nothing to update/delete yet
            n_c_r, n_u, n_d = rest, 0, 0
        evolved = (
            params.evolve_frac is not None
            and (lsn - 1) >= params.evolve_frac * params.total_events
        )
        plans.append(SegPlan(i, lsn, in_base + int(n_c_r), int(n_u), int(n_d), n_before, evolved))
        n_before += in_base + int(n_c_r)
        lsn += n
        remaining -= n
        i += 1
    return plans


def _pick_targets(rng: np.random.Generator, n: int, n_before: int, params: GenParams) -> np.ndarray:
    """Zipf-skewed existing-key targets; ``hot_frac`` of them forced onto the
    hottest source (SOURCES[0]) by vectorized rejection resampling."""
    if params.zipf_a > 1.0:
        ranks = rng.zipf(params.zipf_a, n)
        tgt = (ranks - 1) % n_before  # hot keys = stable low indices
    else:
        tgt = rng.integers(0, n_before, n)
    if params.hot_frac > 0 and n > 0:
        force = rng.random(n) < params.hot_frac
        idx = np.flatnonzero(force)
        for _ in range(24):
            if idx.size == 0:
                break
            cand = rng.integers(0, n_before, idx.size)
            ok = source_index_of(cand, params.seed) == 0
            tgt[idx[ok]] = cand[ok]
            idx = idx[~ok]
    return tgt.astype(np.int64)


def gen_segment(params: GenParams, plan: SegPlan) -> pa.Table:
    """Materialize one WAL segment as an Arrow table (fully vectorized)."""
    rng = np.random.default_rng([params.seed, 1_000_003 + plan.index])
    n = plan.n
    ops = np.array(["c"] * plan.n_c + ["u"] * plan.n_u + ["d"] * plan.n_d, dtype=object)
    rng.shuffle(ops)
    lsn = np.arange(plan.first_lsn, plan.first_lsn + n, dtype=np.int64)

    key_idx = np.empty(n, dtype=np.int64)
    c_mask = ops == "c"
    key_idx[c_mask] = plan.n_before + np.arange(plan.n_c)
    n_t = plan.n_u + plan.n_d
    if n_t > 0:
        key_idx[~c_mask] = _pick_targets(rng, n_t, plan.n_before, params)

    src_idx = source_index_of(key_idx, params.seed)
    doc_ids = pa.array(
        [f"{SOURCES[s]}-{k:08d}" for s, k in zip(src_idx, key_idx)], pa.string()
    )

    alive = ops != "d"
    alive_pa = pa.array(alive)
    lens_full = np.zeros(n, dtype=np.int64)
    lens_full[alive] = rng.integers(params.tok_min, params.tok_max + 1, int(alive.sum()))
    flat = rng.integers(0, params.vocab, int(lens_full.sum()), dtype=np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens_full, out=offsets[1:])
    tokens = pa.LargeListArray.from_arrays(pa.array(offsets), pa.array(flat)).cast(
        pa.list_(pa.int32())
    )
    tokens = pc.if_else(alive_pa, tokens, pa.scalar(None, type=pa.list_(pa.int32())))

    n_tok_type = pa.int64() if plan.evolved else pa.int32()
    n_tok = pa.array(lens_full, type=n_tok_type, mask=~alive)
    source_col = pc.if_else(
        alive_pa,
        pa.array([SOURCES[s] for s in src_idx], pa.string()),
        pa.scalar(None, type=pa.string()),
    )

    cols = {
        "lsn": pa.array(lsn),
        "op": pa.array(ops, pa.string()),
        "doc_id": doc_ids,
        "tokens": tokens,
        "n_tok": n_tok,
        "source": source_col,
    }
    if plan.evolved:
        lang = pa.array([LANGS[j] for j in rng.integers(0, len(LANGS), n)], pa.string())
        cols["lang"] = pc.if_else(alive_pa, lang, pa.scalar(None, type=pa.string()))
        return pa.table(cols, schema=EVOLVED_CHANGE_SCHEMA)
    return pa.table(cols, schema=CHANGE_SCHEMA)


def write_segment(wal_dir: str, params: GenParams, plan: SegPlan) -> str:
    table = gen_segment(params, plan)
    path = segment_path(wal_dir, plan.first_lsn, plan.first_lsn + plan.n - 1)
    if params.fmt == "jsonl":
        path = path[: -len(".parquet")] + ".jsonl"
        tmp = path + f".tmp.{os.getpid()}"
        table.to_pandas().to_json(tmp, orient="records", lines=True)
        os.replace(tmp, path)
        return path
    tmp = path + f".tmp.{os.getpid()}"
    # lz4 + small row groups: WAL segments are transient (read once per
    # replay), so cheap decode beats ratio, and multiple row groups per file
    # let read_parquet split one segment across several read tasks (a single
    # monolithic row group caps read parallelism at the file count).
    pq.write_table(table, tmp, compression="lz4", row_group_size=8192)
    os.replace(tmp, path)
    return path


def generate_wal(wal_dir: str, params: GenParams, parallel: bool = False) -> list[str]:
    """Write all segments. ``parallel=True`` fans segment tasks out over Ray
    (each segment is an independent pure function of (params, plan))."""
    os.makedirs(wal_dir, exist_ok=True)
    plans = plan_segments(params)

    def target_dir(plan: SegPlan) -> str:
        if not params.segments_per_shard:
            return wal_dir
        first = plans[(plan.index // params.segments_per_shard) * params.segments_per_shard].first_lsn
        d = os.path.join(wal_dir, f"shard-{first:012d}")
        os.makedirs(d, exist_ok=True)
        return d

    if parallel:
        import ray

        if ray.is_initialized():
            write_remote = ray.remote(num_cpus=1)(write_segment)
            return ray.get(
                [write_remote.remote(target_dir(p), params, p) for p in plans]
            )
    return [write_segment(target_dir(p), params, p) for p in plans]


EVENT_TYPES = ("view", "click", "conv")
_EVENT_CUMW = np.cumsum((0.7, 0.25, 0.05))


@dataclass(frozen=True)
class FactGenParams:
    """Append-only fact stream (the impressions/clicks workload,
    /root/reference/seeder/seed.py:145-200): every op is an insert, rows are
    immutable, timestamps advance with the log so the stream spans several
    calendar months (exercising time partitioning)."""

    total_events: int = 5_000
    events_per_segment: int = 2_000
    seed: int = 77
    n_docs: int = 2_000              # referenced doc key space
    start_epoch_s: int = 1_704_067_200  # 2024-01-01T00:00:00Z
    span_s: int = 90 * 86_400        # ~3 months of events
    fmt: str = "parquet"
    # out-of-order event time: this fraction of events arrives with an event
    # timestamp late_by_s behind its in-order position (0 = strictly monotone;
    # the knob that exercises event-time watermark / late-data accounting)
    late_frac: float = 0.0
    late_by_s: int = 3_600


def gen_fact_segment(params: FactGenParams, index: int, first_lsn: int, n: int) -> pa.Table:
    """One fact WAL segment — pure function of (params, index), vectorized."""
    from ..schemas import FACT_CHANGE_SCHEMA

    rng = np.random.default_rng([params.seed, 2_000_003 + index])
    lsn = np.arange(first_lsn, first_lsn + n, dtype=np.int64)
    # timestamps advance with the LSN (append-only event time); whole-second
    # resolution so string renderings agree across engines
    step_s = max(1, params.span_s // params.total_events)
    ts_us = (np.int64(params.start_epoch_s) + (lsn - 1) * step_s) * 1_000_000
    key_idx = rng.integers(0, params.n_docs, n)
    src_idx = source_index_of(key_idx, params.seed)
    et = np.searchsorted(_EVENT_CUMW, rng.random(n), side="right").clip(
        0, len(EVENT_TYPES) - 1
    )
    value = np.round(rng.random(n) * 100.0, 4)
    if params.late_frac > 0:
        # drawn LAST so late_frac=0 streams stay byte-identical to before
        late = rng.random(n) < params.late_frac
        ts_us = ts_us - late.astype(np.int64) * params.late_by_s * 1_000_000
    return pa.table(
        {
            "lsn": pa.array(lsn),
            "op": pa.array(np.full(n, "c", dtype=object), pa.string()),
            "event_id": pa.array([f"ev-{x:012d}" for x in lsn], pa.string()),
            "doc_id": pa.array(
                [f"{SOURCES[s]}-{k:08d}" for s, k in zip(src_idx, key_idx)],
                pa.string(),
            ),
            "event_ts": pa.array(ts_us, pa.timestamp("us")),
            "event_type": pa.array([EVENT_TYPES[i] for i in et], pa.string()),
            "value": pa.array(value, pa.float64()),
        },
        schema=FACT_CHANGE_SCHEMA,
    )


def generate_fact_wal(wal_dir: str, params: FactGenParams) -> list[str]:
    os.makedirs(wal_dir, exist_ok=True)
    paths, lsn, i = [], 1, 0
    remaining = params.total_events
    while remaining > 0:
        n = min(params.events_per_segment, remaining)
        table = gen_fact_segment(params, i, lsn, n)
        path = segment_path(wal_dir, lsn, lsn + n - 1)
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(table, tmp, compression="lz4", row_group_size=8192)
        os.replace(tmp, path)
        paths.append(path)
        lsn += n
        remaining -= n
        i += 1
    return paths


def ensure_fact_wal(cache_root: str, params: FactGenParams, tag: str) -> str:
    """Idempotent cached fact-WAL generation. The DONE marker records the
    generating params; a cache built from DIFFERENT params is regenerated
    (stale caches would silently desync query and oracle)."""
    import shutil

    wal_dir = os.path.join(cache_root, tag)
    marker = os.path.join(wal_dir, "_DONE")
    want = repr(params)
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == want:
                return wal_dir
        shutil.rmtree(wal_dir)
    elif os.path.isdir(wal_dir):
        # dir without a marker = an interrupted generation; its partial
        # segments would mix with (and pass listing validation alongside)
        # the new run's, silently desyncing query and oracle
        shutil.rmtree(wal_dir)
    generate_fact_wal(wal_dir, params)
    with open(marker, "w") as f:
        f.write(want)
    return wal_dir


def ensure_wal(cache_root: str, params: GenParams, tag: str, parallel: bool = False) -> str:
    """Idempotent cached generation: /{cache_root}/{tag}/ with a DONE marker
    recording the generating params. A cache built from DIFFERENT params is
    regenerated (same contract as ensure_fact_wal — a stale cache would
    silently desync the Ray query from its DuckDB oracle)."""
    import shutil

    wal_dir = os.path.join(cache_root, tag)
    marker = os.path.join(wal_dir, "_DONE")
    want = repr(params)
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == want:
                return wal_dir
        shutil.rmtree(wal_dir)
    elif os.path.isdir(wal_dir):
        # dir without a marker = an interrupted generation; its partial
        # segments would mix with (and pass listing validation alongside)
        # the new run's, silently desyncing query and oracle
        shutil.rmtree(wal_dir)
    generate_wal(wal_dir, params, parallel=parallel)
    with open(marker, "w") as f:
        f.write(want)
    return wal_dir


@dataclass
class CollapseGenParams:
    """Canonical CollapsingMergeTree change stream: to update a key, emit a
    cancel COPY of its live state (sign=-1) then the new state (sign=+1); to
    delete, emit the cancel only; first sight of a key is a bare state row.
    Deterministic (seeded), so oracles can replay the same stream."""

    total_events: int = 5_000
    events_per_segment: int = 2_000
    seed: int = 99
    n_docs: int = 2_000
    start_epoch_s: int = 1_704_067_200  # 2024-01-01T00:00:00Z
    span_s: int = 90 * 86_400
    delete_frac: float = 0.2  # of actions on a live key, cancel-only


def generate_collapse_wal(wal_dir: str, params: CollapseGenParams) -> list[str]:
    """Emit the stream as LSN-named parquet segments with a ``sign`` int32
    column (the collapse-mode fact schema). Generation keeps the live-state
    dict so cancels carry exact state copies (the canonical usage the
    ClickHouse docs prescribe)."""
    rng = np.random.default_rng(params.seed)
    live: dict[int, float] = {}
    keys: list[int] = []
    signs: list[int] = []
    values: list[float] = []
    while len(keys) < params.total_events:
        k = int(rng.integers(0, params.n_docs))
        if k not in live:
            v = float(rng.integers(0, 100_000))
            keys.append(k); signs.append(1); values.append(v)
            live[k] = v
        elif rng.random() < params.delete_frac:
            keys.append(k); signs.append(-1); values.append(live.pop(k))
        else:
            keys.append(k); signs.append(-1); values.append(live[k])
            v = float(rng.integers(0, 100_000))
            keys.append(k); signs.append(1); values.append(v)
            live[k] = v
    keys = keys[: params.total_events]
    signs = signs[: params.total_events]
    values = values[: params.total_events]

    os.makedirs(wal_dir, exist_ok=True)
    paths = []
    n_total = len(keys)
    ts_step = params.span_s * 1_000_000 // max(n_total, 1)
    start_us = params.start_epoch_s * 1_000_000
    lsn0 = 1
    for i in range(0, n_total, params.events_per_segment):
        j = min(i + params.events_per_segment, n_total)
        n = j - i
        lsn = np.arange(lsn0, lsn0 + n, dtype=np.int64)
        t = pa.table(
            {
                "lsn": pa.array(lsn),
                "op": pa.array(["c"] * n, pa.string()),
                "event_id": pa.array([f"ev-{x:012d}" for x in lsn], pa.string()),
                "doc_id": pa.array(
                    [f"doc-{k:08d}" for k in keys[i:j]], pa.string()
                ),
                "event_ts": pa.array(
                    start_us + lsn * ts_step, pa.timestamp("us")
                ),
                "event_type": pa.array(
                    ["state" if s > 0 else "cancel" for s in signs[i:j]],
                    pa.string(),
                ),
                "value": pa.array(values[i:j], pa.float64()),
                "sign": pa.array(signs[i:j], pa.int32()),
            }
        )
        path = segment_path(wal_dir, lsn0, lsn0 + n - 1)
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(t, tmp, compression="lz4", row_group_size=8192)
        os.replace(tmp, path)
        paths.append(path)
        lsn0 += n
    return paths


def ensure_collapse_wal(
    cache_root: str, params: CollapseGenParams, tag: str
) -> str:
    """Idempotent cached collapse-WAL generation (the ensure_fact_wal
    contract: DONE marker records params, mismatches regenerate)."""
    import shutil

    wal_dir = os.path.join(cache_root, tag)
    marker = os.path.join(wal_dir, "_DONE")
    want = repr(params)
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == want:
                return wal_dir
        shutil.rmtree(wal_dir)
    elif os.path.isdir(wal_dir):
        shutil.rmtree(wal_dir)
    generate_collapse_wal(wal_dir, params)
    with open(marker, "w") as f:
        f.write(want)
    return wal_dir
