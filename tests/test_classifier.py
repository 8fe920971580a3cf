"""Hashed-feature multinomial Naive Bayes: exact training/scoring oracles.

The distributed trainer and the actor-pool scorer are each checked against
an INDEPENDENT per-document Python recompute (Counter loops — the opposite
code shape from the vectorized kernels), the forced-distributed combine is
pinned identical to the driver combine, and the learnability check uses a
deliberately separable synthetic corpus (the real testdata's lang column is
independent of its text by construction, so it can't probe learning)."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from clickhouse_data_pipeline_ray.functions.classifier import (
    _GOLDEN,
    NBModel,
    NBScorer,
    _featurize,
    classify,
    score_table,
    train_nb,
)

DIM = 1 << 12


def _hash_words(words: list[str]) -> np.ndarray:
    from pandas.util import hash_array

    return hash_array(np.array(words, dtype=object), categorize=False)


def _doc_buckets(text: str | None, dim: int, bigrams: bool) -> list[int]:
    """Per-doc reference featurizer: plain Python, one doc at a time."""
    if text is None:
        return []
    words = text.split(" ")
    # exact Python-int arithmetic (np.uint64 % python-int would promote to
    # float64 and corrupt buckets — the kernel itself uses np.uint64 % np.uint64)
    h = [int(x) for x in _hash_words(words)]
    out = [x % dim for x in h]
    if bigrams:
        mask = (1 << 64) - 1
        g = int(_GOLDEN)
        for i in range(len(h) - 1):
            out.append((((h[i] * g) & mask) ^ h[i + 1]) % dim)
    return out


def _corpus(seed: int = 7, n: int = 240) -> tuple[list[str], list[str]]:
    """Separable two-class corpus: disjoint core vocab + shared noise."""
    rng = np.random.default_rng(seed)
    hq = ["clear", "concise", "cited", "edited", "sourced", "verified"]
    lq = ["spam", "click", "winner", "free", "casino", "pills"]
    noise = ["the", "a", "of", "and", "to", "in"]
    texts, labels = [], []
    for i in range(n):
        pos = i % 3 != 0  # 2:1 class skew so priors differ
        core = hq if pos else lq
        k = int(rng.integers(4, 12))
        words = list(rng.choice(core, size=k)) + list(
            rng.choice(noise, size=int(rng.integers(2, 6)))
        )
        rng.shuffle(words)
        texts.append(" ".join(words))
        labels.append("hq" if pos else "lq")
    return texts, labels


def _ds(texts, labels, ray):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "label": pa.array(labels, pa.string()),
            }
        )
    ).repartition(5)


def _collect(ds, ray) -> pa.Table:
    return pa.concat_tables(
        ray.get(r) for r in ds.materialize().to_arrow_refs()
    ).combine_chunks()


def test_featurize_bigrams_respect_row_boundaries():
    two = pa.array(["a b", "c d"])
    one = pa.array(["a b c d"])
    b2, r2, _ = _featurize(two, DIM, bigrams=True)
    b1, _, _ = _featurize(one, DIM, bigrams=True)
    # one doc: 4 unigrams + 3 bigrams; two docs: 4 unigrams + 2 bigrams —
    # the (b, c) pair across the doc boundary must NOT appear
    assert len(b1) == 7 and len(b2) == 6
    assert sorted(np.bincount(r2, minlength=2)) == [3, 3]
    assert set(b2.tolist()) < set(b1.tolist())


@pytest.mark.parametrize("bigrams", [False, True])
def test_train_counts_match_per_doc_oracle(ray_session, bigrams):
    texts, labels = _corpus()
    model = train_nb(
        _ds(texts, labels, ray_session),
        label_col="label",
        dim=DIM,
        bigrams=bigrams,
    )
    assert model.classes == ["hq", "lq"]
    want_fc = np.zeros((2, DIM), dtype=np.int64)
    want_dc = np.zeros(2, dtype=np.int64)
    for t, l in zip(texts, labels):
        c = model.classes.index(l)
        want_dc[c] += 1
        for b, k in Counter(_doc_buckets(t, DIM, bigrams)).items():
            want_fc[c, b] += k
    np.testing.assert_array_equal(model.doc_counts, want_dc)
    np.testing.assert_array_equal(model.feature_counts, want_fc)
    # closed-form weights over the exact counts
    np.testing.assert_allclose(
        model.log_prior, np.log(want_dc / want_dc.sum()), rtol=0, atol=0
    )
    denom = want_fc.sum(axis=1, keepdims=True) + 1.0 * DIM
    np.testing.assert_allclose(
        model.log_lik,
        np.log((want_fc + 1.0) / denom).astype(np.float32),
        rtol=0,
        atol=0,
    )


def test_distributed_combine_identical(ray_session):
    texts, labels = _corpus(seed=11)
    ds = _ds(texts, labels, ray_session)
    a = train_nb(ds, label_col="label", dim=DIM)
    b = train_nb(ds, label_col="label", dim=DIM, driver_limit=0)
    np.testing.assert_array_equal(a.feature_counts, b.feature_counts)
    np.testing.assert_array_equal(a.doc_counts, b.doc_counts)
    np.testing.assert_array_equal(a.log_lik, b.log_lik)


def test_score_matches_per_doc_oracle(ray_session):
    texts, labels = _corpus(seed=3)
    ds = _ds(texts, labels, ray_session)
    model = train_nb(ds, label_col="label", dim=DIM)
    got = _collect(classify(ds, model, positive="hq"), ray_session)
    got = got.sort_by("doc_id")
    ll = model.log_lik.astype(np.float64)
    for i, (t, _) in enumerate(zip(texts, labels)):
        bl = _doc_buckets(t, DIM, model.bigrams)
        s = np.array(
            [model.log_prior[c] + sum(ll[c][b] for b in bl) for c in range(2)]
        )
        pred = model.classes[int(s.argmax())]
        p = np.exp(s - s.max())
        p /= p.sum()
        assert got.column("pred_label")[i].as_py() == pred
        np.testing.assert_allclose(
            got.column("pred_prob")[i].as_py(), p.max(), rtol=1e-9
        )
        np.testing.assert_allclose(
            got.column("p_positive")[i].as_py(), p[0], rtol=1e-9
        )


def test_learns_separable_heldout(ray_session):
    texts, labels = _corpus(seed=5, n=300)
    tr_t, tr_l = texts[:200], labels[:200]
    te_t, te_l = texts[200:], labels[200:]
    model = train_nb(_ds(tr_t, tr_l, ray_session), label_col="label", dim=DIM)
    got = _collect(
        classify(_ds(te_t, te_l, ray_session), model), ray_session
    ).sort_by("doc_id")
    preds = got.column("pred_label").to_pylist()
    acc = np.mean([p == l for p, l in zip(preds, te_l)])
    assert acc >= 0.95


def test_save_load_roundtrip_and_path_scorer(ray_session, tmp_path):
    texts, labels = _corpus(seed=9, n=60)
    ds = _ds(texts, labels, ray_session)
    model = train_nb(ds, label_col="label", dim=DIM)
    path = str(tmp_path / "model")
    model.save(path)
    model.save(path)  # idempotent overwrite
    loaded = NBModel.load(path)
    assert loaded.classes == model.classes and loaded.dim == model.dim
    np.testing.assert_array_equal(loaded.log_lik, model.log_lik)
    np.testing.assert_array_equal(loaded.feature_counts, model.feature_counts)
    # the CLI latency path (model from disk, no broadcast) scores identically
    scorer = NBScorer(model_path=path, positive="hq")
    batch = pa.table({"text": pa.array(texts)})
    via_path = scorer(batch)
    want = score_table(
        batch.column("text"),
        model.classes,
        model.dim,
        model.bigrams,
        model.log_prior,
        model.log_lik,
        "hq",
    )
    assert via_path.column("pred_label").combine_chunks().equals(
        want["pred_label"]
    )
    assert via_path.column("p_positive").combine_chunks().equals(
        want["p_positive"]
    )


def test_null_and_empty_text_prior_only(ray_session):
    texts, labels = _corpus(seed=13, n=90)
    model = train_nb(_ds(texts, labels, ray_session), label_col="label", dim=DIM)
    batch = pa.table({"text": pa.array([None, ""], pa.string())})
    out = NBScorer(payload=model.payload(), positive="hq")(batch)
    # null text → zero features → prior-only prediction (hq has the 2:1
    # prior). "" splits to one empty-string token — still deterministic.
    assert out.column("pred_label")[0].as_py() == "hq"
    prior = np.exp(model.log_prior)
    np.testing.assert_allclose(
        out.column("p_positive")[0].as_py(), prior[0] / prior.sum(), rtol=1e-12
    )


def test_min_prob_filter(ray_session):
    texts, labels = _corpus(seed=21, n=120)
    ds = _ds(texts, labels, ray_session)
    model = train_nb(ds, label_col="label", dim=DIM)
    scored = _collect(classify(ds, model, positive="hq"), ray_session)
    kept = _collect(
        classify(ds, model, positive="hq", min_prob=0.5), ray_session
    )
    want = scored.filter(
        pa.compute.greater_equal(scored.column("p_positive"), 0.5)
    )
    assert kept.num_rows == want.num_rows
    assert 0 < kept.num_rows < scored.num_rows
    assert sorted(kept.column("doc_id").to_pylist()) == sorted(
        want.column("doc_id").to_pylist()
    )
