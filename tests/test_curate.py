"""Curation pipeline: snapshot → LM ppl cut → classifier cut → shards.

Oracle: the kept doc_id set must EQUAL a driver-side recompute that runs
the same broadcast payloads through the scoring kernels over the snapshot
and applies the thresholds in pandas — i.e. the distributed composition
adds/loses nothing. Shards carry the score columns and reassemble to
exactly the kept set."""

import numpy as np
import pyarrow as pa
import pytest

from clickhouse_data_pipeline_ray.functions.classifier import (
    NBScorer,
    refresh_table_classifier,
)
from clickhouse_data_pipeline_ray.functions.lm import LMScorer, refresh_table_lm
from clickhouse_data_pipeline_ray.pipelines.apply import (
    ApplyConfig,
    apply_once,
    create_table,
    snapshot_table,
)
from clickhouse_data_pipeline_ray.pipelines.curate import (
    curate_table,
    load_classifier_any,
    load_lm_any,
)
from clickhouse_data_pipeline_ray.pipelines.export import read_shard
from clickhouse_data_pipeline_ray.sources.gen import GenParams, generate_wal

PARAMS = GenParams(
    total_events=3_000, base_events=1_200, events_per_segment=1_500, seed=71,
    tok_min=4, tok_max=40, mix=(0.3, 0.55, 0.15),
)
DIM_U, DIM_B, DIM = 1 << 10, 1 << 12, 1 << 12


@pytest.fixture(scope="module")
def curated(ray_session, tmp_path_factory):
    wal_dir = str(tmp_path_factory.mktemp("wal"))
    generate_wal(wal_dir, PARAMS)
    table_dir = str(tmp_path_factory.mktemp("tbl") / "t")
    create_table(table_dir, num_partitions=6)
    assert apply_once(table_dir, wal_dir, ApplyConfig(salt_factor=1)) is not None
    lm_dir = str(tmp_path_factory.mktemp("m") / "lm")
    clf_dir = str(tmp_path_factory.mktemp("m") / "clf")
    refresh_table_lm(table_dir, lm_dir, dim_u=DIM_U, dim_b=DIM_B)
    refresh_table_classifier(table_dir, clf_dir, dim=DIM)
    return table_dir, lm_dir, clf_dir


def _expected_kept(table_dir, lm_dir, clf_dir, max_ppl, positive, min_prob):
    """Driver-side recompute through the same kernels + pandas thresholds."""
    snap = snapshot_table(table_dir)
    lm = load_lm_any(lm_dir)
    clf = load_classifier_any(clf_dir)
    scored = LMScorer(payload=lm.payload(), text_col="tokens")(snap)
    df = scored.to_pandas()
    df = df[df["lm_ppl"].notna() & (df["lm_ppl"] <= max_ppl)]
    surv = pa.Table.from_pandas(df, preserve_index=False)
    surv = NBScorer(
        payload=clf.payload(), text_col="tokens", positive=positive
    )(surv)
    sdf = surv.to_pandas()
    return set(sdf[sdf["p_positive"] >= min_prob]["doc_id"])


def test_curate_matches_driver_recompute(ray_session, curated, tmp_path):
    table_dir, lm_dir, clf_dir = curated
    snap = snapshot_table(table_dir)
    # thresholds at the medians so both filters genuinely cut
    lm = load_lm_any(lm_dir)
    ppls = (
        LMScorer(payload=lm.payload(), text_col="tokens")(snap)
        .column("lm_ppl")
        .to_pandas()
    )
    max_ppl = float(ppls.median())
    out = str(tmp_path / "shards")
    res = curate_table(
        table_dir,
        out,
        lm_model_dir=lm_dir,
        max_ppl=max_ppl,
        clf_model_dir=clf_dir,
        positive="web",
        min_prob=0.5,
        num_shards=4,
        seed=3,
    )
    want = _expected_kept(table_dir, lm_dir, clf_dir, max_ppl, "web", 0.5)
    got_ids = []
    cols = None
    for s in range(4):
        t = read_shard(out, s)
        if t is None:
            continue
        got_ids.extend(t.column("doc_id").to_pylist())
        cols = t.column_names
    assert set(got_ids) == want
    assert len(got_ids) == len(want) == res["rows_kept"]
    assert 0 < len(want) < snap.num_rows  # both cuts really dropped rows
    # score columns ride into the shards
    assert "lm_ppl" in cols and "p_positive" in cols and "pred_label" in cols


def test_curate_no_filters_is_plain_shuffled_export(ray_session, curated, tmp_path):
    table_dir, _, _ = curated
    out = str(tmp_path / "shards")
    res = curate_table(table_dir, out, num_shards=4, seed=1)
    snap = snapshot_table(table_dir)
    got = []
    for s in range(4):
        t = read_shard(out, s)
        if t is not None:
            got.extend(t.column("doc_id").to_pylist())
    assert sorted(got) == sorted(snap.column("doc_id").to_pylist())
    assert res["rows_kept"] == snap.num_rows


def test_curate_arg_validation(ray_session, curated, tmp_path):
    table_dir, lm_dir, clf_dir = curated
    with pytest.raises(ValueError, match="max_ppl needs"):
        curate_table(table_dir, str(tmp_path / "x"), max_ppl=5.0)
    with pytest.raises(ValueError, match="min_prob needs"):
        curate_table(
            table_dir, str(tmp_path / "x"),
            clf_model_dir=clf_dir, min_prob=0.5,
        )
    with pytest.raises(ValueError, match="not in"):
        curate_table(
            table_dir, str(tmp_path / "x"),
            clf_model_dir=clf_dir, positive="nope", min_prob=0.5,
        )
