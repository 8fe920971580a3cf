"""Generator + WAL discovery unit tests (no Ray)."""

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
