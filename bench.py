"""Benchmark harness: headline CDC-replay throughput + per-query timings.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "extra": {...}}

Env knobs: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS
(default 32), BENCH_EVENTS (default 1_000_000), BENCH_HEADLINE_ONLY=1.

``--scaling`` runs the headline job at num_cpus=8 and num_cpus=32 on the
same (cached) input — best-of-2 fresh processes PER LEG (4 subprocesses
total, volatile 32-cpu leg first) — and reports both
throughputs + scaling efficiency = T(8)/T(32)/4. The sandbox host exposes a
single physical CPU, so num_cpus oversubscribes; results are still a valid
relative-parallelism probe of the pipeline's scheduling behavior (see
BENCH/BASELINE.md for the caveat and aggregate-task-time view).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_EVENTS = int(os.environ.get("BENCH_EVENTS", "1000000"))
CACHE_ROOT = os.environ.get("BENCH_CACHE", "/tmp/cdp_ray_bench")


def _parse_task_seconds(stats_str: str) -> float:
    """Sum the per-operator 'Remote wall time: ... total' figures from a Ray
    Data ds.stats() string — total task-seconds executed across the cluster
    for that execution."""
    import re

    mult = {"us": 1e-6, "ms": 1e-3, "s": 1.0, "m": 60.0, "min": 60.0}
    total = 0.0
    for m in re.finditer(
        r"Remote wall time: [^\n]*?([0-9.]+)(us|ms|s|min|m)\s+total", stats_str
    ):
        total += float(m.group(1)) * mult[m.group(2)]
    return total


def _headline_params():
    """ONE definition of the headline workload + its cache tag — bench_cdc
    and run_stats must profile the SAME WAL or --stats silently breaks down
    a different workload than the headline it claims to explain."""
    from clickhouse_data_pipeline_ray.sources.gen import GenParams

    tok_min = int(os.environ.get("BENCH_TOK_MIN", "256"))
    tok_max = int(os.environ.get("BENCH_TOK_MAX", "2048"))
    params = GenParams(
        total_events=BENCH_EVENTS,
        base_events=BENCH_EVENTS // 4,
        events_per_segment=10_000,
        seed=42,
        tok_min=tok_min,
        tok_max=tok_max,
    )
    return params, f"bench-{BENCH_EVENTS}-{tok_min}-{tok_max}"


def bench_cdc(ray) -> dict:
    """Headline: full CDC replay (gen cached WAL -> engine replay)."""
    import tempfile

    from clickhouse_data_pipeline_ray.pipelines.apply import (
        ApplyConfig,
        create_table,
        replay,
    )
    from clickhouse_data_pipeline_ray.sources.gen import GenParams, ensure_wal
    from clickhouse_data_pipeline_ray.state.manifest import load_manifest

    # Workload = the design payload: pre-tokenized training sequences of
    # 256-2048 tokens (~2.2 KB/row; BENCH_TOK_MIN/MAX override), not toy short
    # rows — with realistic rows the pipeline is compute/bandwidth-bound and
    # throughput + scaling reflect the engine, not fixed scheduling overhead.
    params, tag = _headline_params()
    t_gen0 = time.perf_counter()
    wal_dir = ensure_wal(CACHE_ROOT, params, tag, parallel=True)
    gen_s = time.perf_counter() - t_gen0

    wal_bytes = 0
    # warm the page cache so we measure compute + shuffle, not first disk read
    for name in os.listdir(wal_dir):
        if name.endswith(".parquet"):
            wal_bytes += os.path.getsize(os.path.join(wal_dir, name))
            with open(os.path.join(wal_dir, name), "rb") as f:
                while f.read(1 << 22):
                    pass

    # one bounded apply epoch + final compaction checkpoint; fixed-size merge
    # pool at half the CPUs (actors hold their CPU; upstream needs the rest).
    # Best-of-N fresh replays (BENCH_REPEATS, default 3): this host's
    # effective capacity swings 2-3x between windows, so a single shot
    # measures the neighbors, not the engine.
    # stage_stats: capture per-stage breakdowns so aggregate TASK seconds can
    # be reported alongside wall-clock (the contention-insensitive scaling
    # view — equal task-seconds at both parallelism levels means the job does
    # the same work and any wall gap is scheduling/host, not the engine)
    cfg = ApplyConfig(max_segments=None, salt_factor=8, hot_ratio=4.0,
                      merge_concurrency=max(2, NUM_CPUS // 2),
                      stage_stats=True)
    # default 3: the first replay pays one-time worker warmup, and host
    # capacity arrives in waves — two warm draws sample windows much better
    # than one at ~30 s extra cost.
    repeats = max(1, int(os.environ.get("BENCH_REPEATS", "3")))
    best = None
    samples = []
    import shutil

    for _ in range(repeats):
        table_dir = tempfile.mkdtemp(prefix="cdp_bench_table_", dir=CACHE_ROOT)
        create_table(table_dir, num_partitions=64)
        t0 = time.perf_counter()
        run_epochs = replay(table_dir, wal_dir, cfg)
        run_wall = time.perf_counter() - t0
        samples.append(round(run_wall, 3))
        if best is None or run_wall < best[0]:
            if best is not None:
                shutil.rmtree(best[2], ignore_errors=True)
            best = (run_wall, run_epochs, table_dir)
        else:
            shutil.rmtree(table_dir, ignore_errors=True)
    wall, epochs, table_dir = best
    apply_s = sum(e["wall_s"] for e in epochs if not e.get("compaction"))
    compact_s = sum(e["wall_s"] for e in epochs if e.get("compaction"))
    # compaction stats rows carry no stage_stats -> counted as 0 here; the
    # lo/hi inflation comparison is unaffected (both legs undercount alike)
    agg_task_s = sum(
        _parse_task_seconds(e.get("stage_stats") or "") for e in epochs
    )
    man = load_manifest(table_dir)
    # the replayed table (≈ GBs) is scratch: repeated bench/scaling runs must
    # not accumulate table dirs until the disk fills (observed)
    shutil.rmtree(table_dir, ignore_errors=True)
    return {
        "wall_s": round(wall, 3),
        # every replay's wall time, in run order: quantifies host variance
        # (the recorded headline is the best draw — the engine's capability,
        # not the neighbors') so readers can judge the measurement window
        "wall_s_samples": samples,
        "events": BENCH_EVENTS,
        "events_per_s": round(BENCH_EVENTS / wall, 1),
        "wal_mb": round(wal_bytes / 1e6, 1),
        "mb_per_s": round(wal_bytes / 1e6 / wall, 1),
        "apply_s": round(apply_s, 3),
        "compact_s": round(compact_s, 3),
        "epochs": len(epochs),
        "final_rows": man.total_rows(),
        "gen_s": round(gen_s, 3),
        "agg_task_s": round(agg_task_s, 1),
    }


def bench_latency(ray, events=None) -> dict:
    """Micro-batch tail latency: many SMALL segments applied one per epoch
    through the same replay machinery `apply --follow` uses — the analog of
    the reference's 1 s-poll streaming consumer (stream_etl/core/consumer.py:
    95), measuring how fast an epoch turns around when the WAL tail feeds
    single segments. Reports epochs/s and p50/p95 per-epoch wall (first epoch
    excluded: it pays Ray's one-time worker warmup)."""
    import shutil
    import tempfile

    from clickhouse_data_pipeline_ray.pipelines.apply import (
        ApplyConfig,
        create_table,
        replay,
    )
    from clickhouse_data_pipeline_ray.sources.gen import GenParams, ensure_wal

    events = int(os.environ.get("BENCH_LATENCY_EVENTS", "50000")) if events is None else events
    seg = int(os.environ.get("BENCH_LATENCY_SEGMENT", "1000"))
    params = GenParams(
        total_events=events,
        base_events=events // 4,
        events_per_segment=seg,
        seed=42,
        tok_min=256,
        tok_max=2048,
    )
    wal_dir = ensure_wal(CACHE_ROOT, params, f"lat-{events}-{seg}", parallel=True)
    table_dir = tempfile.mkdtemp(prefix="cdp_lat_table_", dir=CACHE_ROOT)
    create_table(table_dir, num_partitions=16)
    cfg = ApplyConfig(max_segments=1, merge_concurrency=max(2, NUM_CPUS // 4))
    t0 = time.perf_counter()
    epochs = replay(table_dir, wal_dir, cfg)
    wall = time.perf_counter() - t0
    shutil.rmtree(table_dir, ignore_errors=True)
    walls = sorted(e["wall_s"] for e in epochs[1:] if not e.get("compaction"))
    if not walls:
        walls = [e["wall_s"] for e in epochs]
    p = lambda q: round(walls[min(len(walls) - 1, int(q * len(walls)))], 3)
    return {
        "metric": "cdc_epoch_latency (single-segment micro-batches via the follow-tail path)",
        "events": events,
        "events_per_segment": seg,
        "epochs": len(epochs),
        "wall_s": round(wall, 3),
        "epochs_per_s": round(len(epochs) / wall, 3),
        "epoch_p50_s": p(0.50),
        "epoch_p95_s": p(0.95),
        "events_per_s": round(events / wall, 1),
        "num_cpus": NUM_CPUS,
    }


BENCH_QUERIES = [
    "cdc_append_replay",
    "cdc_sum_replay",
    "cdc_fact_monthly_kpi",
    "lww_latest_event_per_user",
    "storage_ops",
    "bm25_topk",
    "kpi_daily_events",
    "kpi_rollup_daily",
    "kpi_source_stats",
    "ctr_daily",
    "orders_by_nation",
    "revenue_by_brand",
    "top5_users_by_value",
    "order_lineitem_revenue",
    "orders_no_lineitem",
    "sessionize_events",
    "running_user_value",
    "window_events",
    "prev_event_gap",
    "doc_length_percentiles",
    "export_sorted_range",
    "sketch_profile",
    "top_docs_per_source",
    "sample_documents",
    "pack_sequences",
    "corpus_clean",
    "click_attribution",
    "cdc_registry_sync",
    "cdc_epoch_diff",
    "cdc_mv_daily_performance",
    "cdc_mv_source_ctr",
    "dedup_exact_documents",
    "segment_dedup_documents",
    "term_doc_frequency",
    "redact_documents",
    "repetition_stats_documents",
    "token_counts_documents",
    "quality_score_documents",
    "ann_topk_embeddings",
    "centroid_assign_embeddings",
    "embedding_neardup",
    "minhash_dedup_documents",
    "simhash_documents",
    "ngram_jaccard_documents",
    "lang_id_documents",
    "decontaminate_documents",
    "multimodal_decode",
]


def bench_queries(ray) -> dict:
    import ray.data as rd
    from clickhouse_data_pipeline_ray.pipelines.queries import ALL_QUERIES

    out = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        res = ALL_QUERIES[name](SF_DIR)
        if isinstance(res, rd.Dataset):
            for _ in res.iter_batches(batch_format="pyarrow"):
                pass
        out[name] = round(time.perf_counter() - t0, 3)
    out.update(bench_corpus_models(ray))
    return out


def bench_corpus_models(ray) -> dict:
    """Learned-filter timings (not queries() entries — the driver contract
    is capped at 50): hashed-NB classifier train+score and Stupid-Backoff
    LM train+perplexity-score over the documents table."""
    import ray.data as rd
    from clickhouse_data_pipeline_ray.functions.classifier import (
        classify, train_nb,
    )
    from clickhouse_data_pipeline_ray.functions.lm import score_lm, train_lm

    docs = os.path.join(SF_DIR, "documents.parquet")
    out = {}
    t0 = time.perf_counter()
    model = train_nb(
        rd.read_parquet(docs, columns=["text", "lang"]), label_col="lang"
    )
    scored = classify(
        rd.read_parquet(docs, columns=["doc_id", "text"]), model,
        positive="en",
    )
    for _ in scored.iter_batches(batch_format="pyarrow"):
        pass
    out["classifier_train_score"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    lm = train_lm(rd.read_parquet(docs, columns=["text"]))
    kept = score_lm(
        rd.read_parquet(docs, columns=["doc_id", "text"]), lm, max_ppl=32.0
    )
    for _ in kept.iter_batches(batch_format="pyarrow"):
        pass
    out["lm_train_score"] = round(time.perf_counter() - t0, 3)
    return out


def bench_storage_ops(ray) -> dict:
    """Storage-engine op timings (not queries() entries — the driver cap):
    collapse-mode replay throughput, skip-index-pruned range scan, and a
    zone-pruned predicate mutation, at the bench scale factor."""
    import shutil
    import tempfile

    import pyarrow as pa

    from clickhouse_data_pipeline_ray.pipelines.apply import (
        ApplyConfig,
        create_table,
        mutate_table,
        replay,
    )
    from clickhouse_data_pipeline_ray.pipelines.queries import (
        _fact_params,
        _fact_wal,
    )
    from clickhouse_data_pipeline_ray.pipelines.scan import read_where
    from clickhouse_data_pipeline_ray.schemas import FACT_SNAPSHOT_SCHEMA
    from clickhouse_data_pipeline_ray.sources.gen import (
        CollapseGenParams,
        ensure_collapse_wal,
    )

    out = {}
    # --- collapse replay: canonical ±1 state/cancel stream, same volume as
    # the fact workload
    params, tag = _fact_params(SF_DIR)
    cwal = ensure_collapse_wal(
        os.path.join(CACHE_ROOT, "collapse_wal"),
        CollapseGenParams(
            total_events=params.total_events,
            events_per_segment=params.events_per_segment,
        ),
        tag,
    )
    ctab = tempfile.mkdtemp(prefix="cdp_bench_collapse_")
    try:
        create_table(
            ctab,
            schema=FACT_SNAPSHOT_SCHEMA.append(pa.field("sign", pa.int32())),
            mode="collapse",
            num_partitions=64,
        )
        t0 = time.perf_counter()
        replay(ctab, cwal, ApplyConfig(write_mode="delta"), final_compact=False)
        out["cdc_collapse_replay"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(ctab, ignore_errors=True)

    # --- skip-index scan + zone-pruned mutation on an lsn/value-indexed
    # append table (multi-epoch replay → per-epoch files → lsn zones prune)
    fwal = _fact_wal(SF_DIR)
    stab = tempfile.mkdtemp(prefix="cdp_bench_skip_")
    try:
        create_table(
            stab, schema=FACT_SNAPSHOT_SCHEMA, mode="append",
            key_col="event_id", num_partitions=64,
            skip_cols=["lsn", "value"],
        )
        replay(stab, fwal, ApplyConfig(max_segments=2), final_compact=False)
        t0 = time.perf_counter()
        ds, plan = read_where(
            stab, "lsn", lo=1, hi=params.total_events // 5,
            columns=["lsn", "value"],
        )
        n = ds.count()
        out["skip_scan_pruned"] = round(time.perf_counter() - t0, 3)
        out["skip_scan_files_pruned_frac"] = round(
            plan["files_pruned"] / max(plan["files_total"], 1), 3
        )
        assert n == params.total_events // 5, (n, plan)
        t0 = time.perf_counter()
        mutate_table(stab, "lsn", lo=1, hi=params.total_events // 10,
                     delete=True)
        out["mutate_delete"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(stab, ignore_errors=True)
    return out


def run_once() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        cdc = bench_cdc(ray)
        queries = {"cdc_replay": cdc["wall_s"]}
        if os.environ.get("BENCH_HEADLINE_ONLY") != "1":
            queries.update(bench_queries(ray))
            queries.update(bench_storage_ops(ray))
            # short micro-batch latency probe (12 × 1k-event single-segment
            # epochs through the follow-tail path) so the per-round JSON also
            # records streaming freshness, not just bulk throughput
            lat = bench_latency(ray, events=12_000)
            cdc["micro_epoch_p50_s"] = lat["epoch_p50_s"]
            cdc["micro_epoch_p95_s"] = lat["epoch_p95_s"]
        return {
            "metric": "cdc_replay_wall_seconds (change-events/s applied to exactly-once parquet upsert)",
            "value": cdc["wall_s"],
            "unit": "sec",
            "queries": queries,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "extra": dict(cdc),
        }
    finally:
        ray.shutdown()


def run_scaling() -> dict:
    def sub(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            BENCH_HEADLINE_ONLY="1",
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
        )
        if proc.returncode != 0:
            # surface the leg's Ray traceback — a bare CalledProcessError
            # hides the reason (OOM, disk-full scratch) behind 'status 1'
            sys.stderr.write(proc.stderr)
            raise RuntimeError(f"scaling leg (num_cpus={ncpu}) failed, see stderr")
        return json.loads(proc.stdout.strip().splitlines()[-1])

    # best-of-2 per leg: the sandbox host has noisy neighbors (observed ±50%
    # run-to-run wall variance at idle load averages of 9+), so a single shot
    # per leg measures the neighbors, not the engine
    lo_cpus, hi_cpus = 8, 32
    # hi leg first: on this host the 8-cpu leg is stable across contention
    # waves while the 32-cpu leg swings 2-3x, so a quiet window found at
    # launch time is better spent on the volatile leg (order does not change
    # the protocol — both legs remain fresh processes over the same input)
    hi = min((sub(hi_cpus) for _ in range(2)), key=lambda r: r["value"])
    lo = min((sub(lo_cpus) for _ in range(2)), key=lambda r: r["value"])
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (hi_cpus / lo_cpus)
    return {
        "metric": "cdc_replay_scaling",
        "num_cpus_lo": lo_cpus,
        "num_cpus_hi": hi_cpus,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "events_per_s_lo": lo["extra"]["events_per_s"],
        "events_per_s_hi": hi["extra"]["events_per_s"],
        "mb_per_s_lo": lo["extra"].get("mb_per_s"),
        "mb_per_s_hi": hi["extra"].get("mb_per_s"),
        "scaling_efficiency": round(eff, 3),
        # aggregate task-seconds per leg: equal values mean the 4x-parallel
        # job does the same total work (wall gap = scheduling/host, not the
        # engine); the ratio is the work-inflation view of scaling
        "agg_task_s_lo": lo["extra"].get("agg_task_s"),
        "agg_task_s_hi": hi["extra"].get("agg_task_s"),
        "work_inflation_hi_vs_lo": (
            round(hi["extra"]["agg_task_s"] / lo["extra"]["agg_task_s"], 3)
            if lo["extra"].get("agg_task_s") and hi["extra"].get("agg_task_s")
            else None
        ),
        "events": lo["extra"]["events"],
        "policy": (
            "best-of-2 fresh processes per leg x best-of-"
            f"{os.environ.get('BENCH_REPEATS', '3')} replays in-process"
        ),
    }


def run_soak() -> dict:
    """Lifecycle soak — the full maintenance surface in one command:
    bounded delta-mode apply epochs → WAL truncation at the watermark →
    mid-life repartition P→2P → remaining epochs under the new layout →
    final compaction → exact DuckDB arg_max oracle over the ORIGINAL WAL.
    Proves the epochs/truncate/repartition/compact surfaces compose without
    breaking exactly-once or LWW correctness."""
    import shutil
    import tempfile

    import duckdb
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from clickhouse_data_pipeline_ray.pipelines.apply import (
        ApplyConfig,
        apply_once,
        compact_table,
        create_table,
        read_snapshot,
        repartition_table,
    )
    from clickhouse_data_pipeline_ray.pipelines.kpi import totals
    from clickhouse_data_pipeline_ray.sources.gen import GenParams, ensure_wal
    from clickhouse_data_pipeline_ray.sources.wal import truncate_wal
    from clickhouse_data_pipeline_ray.state.manifest import load_manifest

    events = int(os.environ.get("BENCH_SOAK_EVENTS", "400000"))
    params = GenParams(
        total_events=events,
        base_events=events // 4,
        events_per_segment=10_000,
        seed=42,
        tok_min=256,
        tok_max=2048,
    )
    cached = ensure_wal(CACHE_ROOT, params, f"soak-{events}", parallel=True)
    # the soak TRUNCATES its WAL — work on a copy so the cache stays intact
    wal_dir = tempfile.mkdtemp(prefix="cdp_soak_wal_", dir=CACHE_ROOT)
    # oracle over the original cached WAL (computed before any truncation)
    want = duckdb.sql(
        f"""WITH ev AS (SELECT * FROM read_parquet('{cached}/seg-*.parquet')),
        r AS (SELECT doc_id, arg_max(n_tok, lsn) AS n_tok,
                     arg_max(op, lsn) AS op FROM ev GROUP BY doc_id)
        SELECT count(*), CAST(sum(n_tok) AS BIGINT) FROM r WHERE op != 'd'"""
    ).fetchone()
    for name in os.listdir(cached):
        if name.endswith(".parquet"):
            shutil.copy(os.path.join(cached, name), wal_dir)
    table_dir = tempfile.mkdtemp(prefix="cdp_soak_table_", dir=CACHE_ROOT)
    t0 = time.perf_counter()
    steps = []
    try:
        create_table(table_dir, num_partitions=64)
        cfg = ApplyConfig(max_segments=10, compact_threshold=4,
                          merge_concurrency=max(2, NUM_CPUS // 2))
        n_epochs = 0
        for _ in range(2):  # two bounded epochs before maintenance
            if apply_once(table_dir, wal_dir, cfg) is not None:
                n_epochs += 1
        purged = truncate_wal(
            wal_dir, watermark_lsn=load_manifest(table_dir).watermark
        )
        steps.append(("truncate", len(purged)))
        repartition_table(table_dir, 128, cfg)
        steps.append(("repartition", 128))
        while apply_once(table_dir, wal_dir, cfg) is not None:
            n_epochs += 1
        c = compact_table(table_dir, concurrency=max(2, NUM_CPUS // 2))
        steps.append(("compact", (c or {}).get("partitions_compacted", 0)))
        wall = time.perf_counter() - t0
        got = totals(read_snapshot(table_dir))
        ok = (got["n_docs"], got["sum_tok"]) == (want[0], want[1])
        if not ok:
            raise AssertionError(
                f"soak oracle mismatch: engine {got} vs duckdb {want}"
            )
        return {
            "metric": "cdc_lifecycle_soak",
            "events": events,
            "epochs": n_epochs,
            "steps": steps,
            "wall_s": round(wall, 3),
            "rows": got["n_docs"],
            "oracle_match": ok,
            "num_cpus": NUM_CPUS,
        }
    finally:
        shutil.rmtree(table_dir, ignore_errors=True)
        shutil.rmtree(wal_dir, ignore_errors=True)
        ray.shutdown()


def run_stats() -> dict:
    """One headline replay with `ApplyConfig(stage_stats=True)`: prints Ray
    Data's per-stage execution breakdown (ds.stats()) for the apply epoch —
    the per-stage view the measurement protocol in BASELINE.md promises.
    Human-readable (multi-line), not the one-line JSON contract."""
    import shutil
    import tempfile

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from clickhouse_data_pipeline_ray.pipelines.apply import (
        ApplyConfig,
        create_table,
        replay,
    )
    from clickhouse_data_pipeline_ray.sources.gen import ensure_wal

    params, tag = _headline_params()
    wal_dir = ensure_wal(CACHE_ROOT, params, tag, parallel=True)
    cfg = ApplyConfig(
        merge_concurrency=max(2, NUM_CPUS // 2), stage_stats=True
    )
    table_dir = tempfile.mkdtemp(prefix="cdp_bench_table_", dir=CACHE_ROOT)
    try:
        create_table(table_dir, num_partitions=64)
        epochs = replay(table_dir, wal_dir, cfg, final_compact=False)
        for e in epochs:
            print(f"=== epoch {e['epoch']}: {e['wall_s']} s, "
                  f"{e['events_per_s']} events/s ===")
            print(e.get("stage_stats") or "(driver-side micro-epoch: no Dataset execution)")
        return {"metric": "cdc_replay_stage_stats", "epochs": len(epochs)}
    finally:
        shutil.rmtree(table_dir, ignore_errors=True)
        ray.shutdown()


def run_latency() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        return bench_latency(ray)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    os.makedirs(CACHE_ROOT, exist_ok=True)
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--latency" in sys.argv:
        print(json.dumps(run_latency()))
    elif "--stats" in sys.argv:
        print(json.dumps(run_stats()))
    elif "--soak" in sys.argv:
        print(json.dumps(run_soak()))
    else:
        print(json.dumps(run_once()))
