"""Stupid-Backoff n-gram LM: exact count/score oracles and filter behavior.

The distributed trainer's counts and the vectorized scorer's per-doc
log-probabilities are each pinned to independent per-document Python
recomputes (Counter/loop style); the perplexity ordering check uses docs
drawn from the training distribution vs out-of-vocabulary docs."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from clickhouse_data_pipeline_ray.functions.classifier import _GOLDEN
from clickhouse_data_pipeline_ray.functions.lm import (
    BACKOFF,
    LMModel,
    LMScorer,
    score_lm,
    train_lm,
)

DIM_U, DIM_B = 1 << 10, 1 << 12
MASK = (1 << 64) - 1
G = int(_GOLDEN)


def _hashes(words):
    from pandas.util import hash_array

    return [int(x) for x in hash_array(np.array(words, dtype=object))]


def _doc_grams(text, dim_u, dim_b):
    """Per-doc reference: (unigram buckets, bigram buckets) in order."""
    if text is None:
        return [], []
    h = _hashes(text.split(" "))
    uni = [x % dim_u for x in h]
    bi = [
        (((h[i] * G) & MASK) ^ h[i + 1]) % dim_b for i in range(len(h) - 1)
    ]
    return uni, bi


def _corpus(seed=17, n=150):
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    texts = []
    for _ in range(n):
        k = int(rng.integers(3, 15))
        texts.append(" ".join(rng.choice(vocab, size=k)))
    return texts


def _ds(texts, extra_cols=None):
    import ray.data as rd

    cols = {
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }
    cols.update(extra_cols or {})
    return rd.from_arrow(pa.table(cols)).repartition(4)


def _collect(ds, ray):
    tables = [
        t
        for t in (ray.get(r) for r in ds.materialize().to_arrow_refs())
        if t.num_rows
    ]
    return pa.concat_tables(tables).combine_chunks()


@pytest.fixture(scope="module")
def model(ray_session):
    texts = _corpus()
    return texts, train_lm(_ds(texts), dim_u=DIM_U, dim_b=DIM_B)


def test_counts_match_per_doc_oracle(ray_session, model):
    texts, lm = model
    want_u = Counter()
    want_b = Counter()
    n_tok = 0
    for t in texts:
        uni, bi = _doc_grams(t, DIM_U, DIM_B)
        want_u.update(uni)
        want_b.update(bi)
        n_tok += len(uni)
    assert lm.n_tokens == n_tok
    wu = np.zeros(DIM_U, dtype=np.int64)
    for k, v in want_u.items():
        wu[k] = v
    wb = np.zeros(DIM_B, dtype=np.int64)
    for k, v in want_b.items():
        wb[k] = v
    np.testing.assert_array_equal(lm.uni, wu)
    np.testing.assert_array_equal(lm.bi, wb)


def test_distributed_combine_identical(ray_session, model):
    texts, lm = model
    lm2 = train_lm(_ds(texts), dim_u=DIM_U, dim_b=DIM_B, driver_limit=0)
    np.testing.assert_array_equal(lm.uni, lm2.uni)
    np.testing.assert_array_equal(lm.bi, lm2.bi)
    assert lm.n_tokens == lm2.n_tokens


def test_scores_match_per_doc_oracle(ray_session, model):
    texts, lm = model
    # score a mix of in-distribution, out-of-vocab, null, and empty docs
    probe = texts[:20] + ["quux corge grault", None, "", "alpha beta"]
    got = _collect(score_lm(_ds(probe), lm), ray_session).sort_by("doc_id")
    N = float(lm.n_tokens)
    for i, t in enumerate(probe):
        uni, bi = _doc_grams(t, DIM_U, DIM_B)
        if not uni:
            assert got.column("lm_logprob")[i].as_py() is None
            assert got.column("lm_ppl")[i].as_py() is None
            assert got.column("n_lm_tokens")[i].as_py() == 0
            continue
        lps = [np.log(max(lm.uni[uni[0]], 1) / N)]
        for j in range(1, len(uni)):
            cb = lm.bi[bi[j - 1]]
            if cb > 0:
                lps.append(np.log(min(cb / max(lm.uni[uni[j - 1]], 1), 1.0)))
            else:
                lps.append(np.log(BACKOFF * max(lm.uni[uni[j]], 1) / N))
        mean = float(np.mean(lps))
        np.testing.assert_allclose(
            got.column("lm_logprob")[i].as_py(), mean, rtol=1e-9
        )
        np.testing.assert_allclose(
            got.column("lm_ppl")[i].as_py(), np.exp(-mean), rtol=1e-9
        )
        assert got.column("n_lm_tokens")[i].as_py() == len(uni)


def test_in_distribution_beats_oov(ray_session, model):
    texts, lm = model
    probe = [texts[0], "xylo quux corge grault fnord blorp"]
    got = _collect(score_lm(_ds(probe), lm), ray_session).sort_by("doc_id")
    ppl = got.column("lm_ppl").to_pylist()
    assert ppl[0] < ppl[1]


def test_max_ppl_filter_and_null_excluded(ray_session, model):
    texts, lm = model
    probe = texts[:10] + [None, "zzz yyy xxx www"]
    scored = _collect(score_lm(_ds(probe), lm), ray_session)
    ppls = [p for p in scored.column("lm_ppl").to_pylist() if p is not None]
    thr = float(np.median(ppls))
    kept = _collect(score_lm(_ds(probe), lm, max_ppl=thr), ray_session)
    want = [
        i
        for i, p in zip(
            scored.column("doc_id").to_pylist(),
            scored.column("lm_ppl").to_pylist(),
        )
        if p is not None and p <= thr
    ]
    assert sorted(kept.column("doc_id").to_pylist()) == sorted(want)
    assert 10 not in kept.column("doc_id").to_pylist()  # null never passes


def test_save_load_and_path_scorer(ray_session, model, tmp_path):
    texts, lm = model
    path = str(tmp_path / "lm")
    lm.save(path)
    lm.save(path)  # idempotent overwrite
    loaded = LMModel.load(path)
    np.testing.assert_array_equal(loaded.uni, lm.uni)
    np.testing.assert_array_equal(loaded.bi, lm.bi)
    assert loaded.n_tokens == lm.n_tokens
    batch = pa.table({"text": pa.array(texts[:5])})
    a = LMScorer(model_path=path)(batch)
    b = LMScorer(payload=lm.payload())(batch)
    assert a.column("lm_logprob").equals(b.column("lm_logprob"))


def test_token_list_lm(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    toks = [rng.integers(0, 50, size=rng.integers(3, 20)).tolist() for _ in range(80)]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(80), pa.int64()),
                "tokens": pa.array(toks, pa.list_(pa.int32())),
            }
        )
    )
    lm = train_lm(ds, text_col="tokens", dim_u=DIM_U, dim_b=DIM_B)
    assert lm.feature_kind == "tokens"
    assert lm.n_tokens == sum(len(t) for t in toks)
    got = _collect(score_lm(ds, lm, text_col="tokens"), ray_session)
    assert got.num_rows == 80
    assert all(p is not None for p in got.column("lm_ppl").to_pylist())
    # kind guard: tokens-trained LM refuses a text column
    with pytest.raises(ValueError, match="trained on 'tokens'"):
        LMScorer(payload=lm.payload())(pa.table({"text": pa.array(["a b"])}))
