"""Generator + WAL discovery unit tests (no Ray)."""

from dataclasses import replace

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from clickhouse_data_pipeline_ray.sources.gen import (
    GenParams,
    gen_segment,
    generate_wal,
    plan_segments,
    source_index_of,
)
from clickhouse_data_pipeline_ray.sources.wal import list_segments, pending_segments

PARAMS = GenParams(total_events=3_000, base_events=500, events_per_segment=1_000, seed=7)


def test_plan_covers_log_densely():
    plans = plan_segments(PARAMS)
    assert plans[0].first_lsn == 1
    total = 0
    for prev, cur in zip(plans, plans[1:]):
        assert cur.first_lsn == prev.first_lsn + prev.n
        assert cur.n_before == prev.n_before + prev.n_c
    for p in plans:
        total += p.n
    assert total == PARAMS.total_events


def test_base_prefix_is_insert_only():
    plans = plan_segments(PARAMS)
    first = plans[0]
    seg = gen_segment(PARAMS, first)
    ops = seg.column("op").to_pylist()[: PARAMS.base_events]
    assert set(ops) == {"c"}


def test_segment_deterministic():
    plans = plan_segments(PARAMS)
    a = gen_segment(PARAMS, plans[1])
    b = gen_segment(PARAMS, plans[1])
    assert a.equals(b)


def test_lsn_dense_and_unique(tmp_path):
    wal = str(tmp_path / "wal")
    generate_wal(wal, PARAMS)
    segs = list_segments(wal)
    lsns = []
    for s in segs:
        t = pq.read_table(s.path, columns=["lsn"])
        lsns.extend(t.column("lsn").to_pylist())
        assert lsns[-1] == s.last_lsn
    assert lsns == list(range(1, PARAMS.total_events + 1))


def test_updates_target_existing_keys():
    plans = plan_segments(PARAMS)
    seg = gen_segment(PARAMS, plans[2])
    tbl = seg.to_pylist()
    for row in tbl:
        idx = int(row["doc_id"].split("-")[1])
        if row["op"] in ("u", "d"):
            assert idx < plans[2].n_before
        if row["op"] == "d":
            assert row["tokens"] is None and row["source"] is None
        else:
            assert len(row["tokens"]) == row["n_tok"]


def test_source_of_key_consistent_with_doc_id():
    idx = np.arange(0, 200)
    src = source_index_of(idx, PARAMS.seed)
    seg = gen_segment(PARAMS, plan_segments(PARAMS)[0])
    for row in seg.to_pylist()[:200]:
        s, k = row["doc_id"].split("-")
        from clickhouse_data_pipeline_ray.sources.gen import SOURCES

        assert SOURCES[src[int(k)]] == s


def test_pending_segments_pruning(tmp_path):
    wal = str(tmp_path / "wal")
    generate_wal(wal, PARAMS)
    assert len(pending_segments(wal, 0)) == 3
    assert len(pending_segments(wal, 1_000)) == 2
    assert len(pending_segments(wal, 1_500)) == 2  # mid-segment watermark
    assert len(pending_segments(wal, 3_000)) == 0
    assert len(pending_segments(wal, 0, max_segments=1)) == 1


def test_evolved_segments_have_lang_and_wide_n_tok():
    params = GenParams(
        total_events=2_000,
        base_events=500,
        events_per_segment=500,
        evolve_frac=0.5,
        seed=3,
    )
    plans = plan_segments(params)
    assert not plans[0].evolved and plans[-1].evolved
    seg = gen_segment(params, plans[-1])
    assert "lang" in seg.column_names
    assert str(seg.schema.field("n_tok").type) == "int64"


def test_sharded_wal_layout_and_pruned_listing(tmp_path):
    """Shard dirs: replay-identical to flat layout; fully-applied shards are
    pruned at the listing level (never even listed)."""
    import os
    from unittest import mock

    from clickhouse_data_pipeline_ray.sources.wal import (
        list_segments,
        pending_segments,
        truncate_wal,
    )

    p = GenParams(total_events=4_000, base_events=1_000,
                  events_per_segment=500, seed=3, tok_min=4, tok_max=8)
    flat = str(tmp_path / "flat")
    generate_wal(flat, p)
    sharded = str(tmp_path / "sharded")
    generate_wal(sharded, replace(p, segments_per_shard=3))

    shard_dirs = sorted(d for d in os.listdir(sharded) if d.startswith("shard-"))
    assert len(shard_dirs) == 3  # 8 segments in groups of 3
    fs = list_segments(flat)
    ss = list_segments(sharded)
    assert [(s.first_lsn, s.last_lsn) for s in fs] == [
        (s.first_lsn, s.last_lsn) for s in ss
    ]

    # watermark past the first shard (segs 1-3 = lsn 1..1500): that shard's
    # contents are never listed
    listed: list[str] = []
    real_listdir = os.listdir

    def spy(d):
        listed.append(str(d))
        return real_listdir(d)

    with mock.patch("clickhouse_data_pipeline_ray.sources.wal.os.listdir", spy):
        pend = pending_segments(sharded, watermark=1_500)
    assert [s.first_lsn for s in pend] == [1501 + 500 * i for i in range(5)]
    assert not any(d.endswith(shard_dirs[0]) for d in listed)

    # truncation removes applied segments AND the emptied shard dir
    removed = truncate_wal(sharded, 1_500)
    assert len(removed) == 3
    assert not os.path.isdir(os.path.join(sharded, shard_dirs[0]))
    assert len(list_segments(sharded)) == 5


def test_sharded_wal_replays_identically(ray_session, tmp_path):
    from clickhouse_data_pipeline_ray.pipelines.apply import (
        ApplyConfig,
        create_table,
        replay,
        snapshot_table,
    )

    p = GenParams(total_events=3_000, base_events=750,
                  events_per_segment=500, seed=5, tok_min=4, tok_max=8)
    flat, sharded = str(tmp_path / "f"), str(tmp_path / "s")
    generate_wal(flat, p)
    generate_wal(sharded, replace(p, segments_per_shard=2))
    ta, tb = str(tmp_path / "ta"), str(tmp_path / "tb")
    create_table(ta, num_partitions=4)
    create_table(tb, num_partitions=4)
    replay(ta, flat, ApplyConfig(salt_factor=1))
    replay(tb, sharded, ApplyConfig(salt_factor=1))
    assert snapshot_table(ta).equals(snapshot_table(tb))


def test_shard_range_violation_detected(tmp_path):
    """A segment misplaced in an earlier shard (extending past the next
    shard's start) must fail the listing loudly — watermark pruning would
    otherwise silently never apply it."""
    import os
    import shutil

    wal = str(tmp_path / "wal")
    generate_wal(wal, replace(PARAMS, segments_per_shard=1))
    shards = sorted(d for d in os.listdir(wal) if d.startswith("shard-"))
    assert len(shards) >= 2
    # move the second shard's segment into the FIRST shard dir (misplaced:
    # shard-2 still exists, so shard-1's range ends at shard-2's start and
    # the moved segment extends past it)
    src_dir = os.path.join(wal, shards[1])
    seg = os.listdir(src_dir)[0]
    shutil.move(os.path.join(src_dir, seg), os.path.join(wal, shards[0], seg))
    with pytest.raises(ValueError, match="shard range"):
        list_segments(wal)


def test_ensure_wal_regenerates_on_param_change(tmp_path):
    """ensure_wal's _DONE marker records the generating params; a cache built
    from different params is torn down and regenerated (a stale cache would
    silently desync a Ray query from its DuckDB oracle)."""
    import os

    from clickhouse_data_pipeline_ray.sources.gen import ensure_wal

    root = str(tmp_path)
    p1 = replace(PARAMS, total_events=1_500)
    wal = ensure_wal(root, p1, "t")
    marker = os.path.join(wal, "_DONE")
    mtime = os.path.getmtime(marker)
    # same params -> cache hit, nothing rewritten
    assert ensure_wal(root, p1, "t") == wal
    assert os.path.getmtime(marker) == mtime
    # changed params -> regenerated with the new marker
    p2 = replace(PARAMS, total_events=2_500)
    ensure_wal(root, p2, "t")
    with open(marker) as f:
        assert f.read() == repr(p2)
    n_segments = len(list_segments(wal))
    assert n_segments == len(plan_segments(p2))


def test_segments_past_twelve_lsn_digits_are_listed(tmp_path):
    """{:012d} grows past 12 digits at lsn 10^12; the listing regex accepts
    the wider names (a fixed {12} made such segments silently invisible —
    replay would report caught-up while events stopped applying)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clickhouse_data_pipeline_ray.sources.wal import (
        list_segments,
        pending_segments,
        segment_path,
    )

    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    lo, hi = 10**12, 10**12 + 9  # 13-digit LSNs
    t = pa.table(
        {
            "lsn": pa.array(range(lo, hi + 1), pa.int64()),
            "op": pa.array(["c"] * 10),
            "doc_id": pa.array([f"d-{i}" for i in range(10)]),
        }
    )
    pq.write_table(t, segment_path(wal, lo, hi))
    segs = list_segments(wal)
    assert [(s.first_lsn, s.last_lsn) for s in segs] == [(lo, hi)]
    # parsed-int ordering across widths (12-digit before 13-digit)
    pq.write_table(t, segment_path(wal, 999, 1005))
    segs = list_segments(wal)
    assert [s.first_lsn for s in segs] == [999, lo]


def test_pending_segments_zero_cap_means_none(tmp_path):
    """max_segments=0 is a real cap (a dynamic backpressure budget can reach
    zero), not 'unlimited'."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clickhouse_data_pipeline_ray.sources.wal import (
        pending_segments,
        segment_path,
    )

    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    t = pa.table({"lsn": pa.array([1, 2], pa.int64()), "op": pa.array(["c", "c"]),
                  "doc_id": pa.array(["a", "b"])})
    pq.write_table(t, segment_path(wal, 1, 2))
    assert pending_segments(wal, 0, max_segments=0) == []
    assert len(pending_segments(wal, 0, max_segments=None)) == 1


def test_ensure_wal_cleans_interrupted_generation(tmp_path):
    """A cache dir WITHOUT a DONE marker is an interrupted generation: its
    stale segments must be wiped, not mixed contiguously into the new run
    (which would silently desync query and oracle)."""
    from clickhouse_data_pipeline_ray.sources.gen import GenParams, ensure_wal
    from clickhouse_data_pipeline_ray.sources.wal import list_segments

    root = str(tmp_path / "cache")
    params = GenParams(
        total_events=2_000, base_events=500, events_per_segment=500, seed=3,
        tok_min=4, tok_max=8,
    )
    # simulate an interrupted earlier run with different params: segments
    # beyond the new run's range, no marker
    stale = ensure_wal(root, GenParams(
        total_events=4_000, base_events=500, events_per_segment=500, seed=3,
        tok_min=4, tok_max=8,
    ), tag="x")
    os.remove(os.path.join(stale, "_DONE"))  # marker lost mid-crash
    wal = ensure_wal(root, params, tag="x")
    segs = list_segments(wal)
    assert max(s.last_lsn for s in segs) == 2_000  # no stale 2001-4000 tail
