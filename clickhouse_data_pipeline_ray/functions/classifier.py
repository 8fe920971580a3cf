"""Learned text classifier: hashed-feature multinomial Naive Bayes.

The fastText-classifier role of a CCNet/DCLM-style corpus pipeline — a
learned quality / language / domain classifier trained ON the corpus and
then used to score or filter it — built Ray-Data-first:

- **Training is ONE distributed aggregation pass.** Each batch tokenizes,
  hashes tokens into ``dim`` buckets (the hashing trick — the model never
  holds a vocabulary, so its size is fixed regardless of corpus size), and
  emits SPARSE per-class count partials. The combine auto-switches on
  measured partial volume (the same convention as ``q_term_doc_frequency``
  and ``dedup._multi_member_counts``): driver-small sums in numpy; past the
  limit the partials reduce in-cluster via ``groupby(key).sum`` — one
  shuffle over (class × bucket) partial rows, never raw text — and only the
  finished ≤ C·(dim+1)-row matrix reaches the driver. The model must fit on
  the driver by construction: it is the thing that gets broadcast.
- **Scoring is a broadcast-model actor pool.** The trained weights go into
  the object store ONCE (``ray.put``); each ``NBScorer`` actor fetches them
  once in ``__init__`` (zero-copy for the float32 weight matrix) and scores
  whole batches with per-class ``np.bincount(rows, weights=...)`` — no
  per-row Python, no per-batch model shipping.

Features are word unigrams plus (optionally) bigrams, fastText-style.
Bigram buckets are a numeric mix of the two unigram hashes (golden-ratio
multiply + xor), so bigram featurization never materializes joined strings.
Hashes are pandas ``hash_array`` (SipHash, fixed key) — deterministic
across processes and the same primitive the dedup family uses.

Reference analog: the reference pipeline has no learned filter (its
transforms are defensive parsers, stream_etl/core/processor.py); this is
part of the beyond-reference LLM-data operator set, next to lang-id and
quality heuristics in ``textstats.py``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pandas.util import hash_array

import ray
import ray.data

# Partial-row budget for the driver-side count combine; above it the final
# combine stays in the cluster (groupby over packed keys) and only the
# reduced model-sized matrix reaches the driver.
NB_DRIVER_LIMIT = 1_000_000

# 64-bit golden-ratio constant for the bigram hash mix (public-domain
# Fibonacci-hashing constant; same role as in segment dedup's rolling hash).
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

DEFAULT_DIM = 1 << 18


def _featurize(
    text: pa.ChunkedArray | pa.Array, dim: int, bigrams: bool
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(feature buckets, row index per feature, words-per-row) for one
    batch's text column. One Arrow split/flatten + one vectorized SipHash;
    bigrams are numeric mixes of adjacent unigram hashes within a row (the
    row-boundary mask keeps a doc's last word from pairing with the next
    doc's first). Null text rows contribute zero features but keep their
    row slot, so scoring them yields prior-only scores."""
    lists = pc.split_pattern(text, pattern=" ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    lens = (
        pc.fill_null(pc.list_value_length(lists), 0)
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    words = pc.list_flatten(lists).to_numpy(zero_copy_only=False).astype(object)
    rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    h = hash_array(words, categorize=False)  # uint64 SipHash
    buckets = (h % np.uint64(dim)).astype(np.int64)
    if bigrams and len(h) > 1:
        same_row = rows[1:] == rows[:-1]
        bi = ((h[:-1] * _GOLDEN) ^ h[1:]) % np.uint64(dim)
        buckets = np.concatenate([buckets, bi[same_row].astype(np.int64)])
        rows = np.concatenate([rows, rows[1:][same_row]])
    return buckets, rows, lens


@dataclass
class NBModel:
    """Trained multinomial NB over hashed features. ``log_lik`` is float32
    (C × dim) — the broadcast payload; scoring upcasts to float64 in the
    per-class reductions."""

    classes: list[str]
    dim: int
    alpha: float
    bigrams: bool
    doc_counts: np.ndarray  # (C,) int64
    feature_counts: np.ndarray  # (C, dim) int64 — kept for exact-oracle tests
    log_prior: np.ndarray  # (C,) float64
    log_lik: np.ndarray  # (C, dim) float32

    def save(self, path: str) -> None:
        """Persist under ``path`` with the repo-wide tmp+rename commit
        protocol: a crashed save never leaves a half-written model."""
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        np.savez(
            os.path.join(tmp, "weights.npz"),
            doc_counts=self.doc_counts,
            feature_counts=self.feature_counts,
            log_prior=self.log_prior,
            log_lik=self.log_lik,
        )
        meta = {
            "classes": self.classes,
            "dim": self.dim,
            "alpha": self.alpha,
            "bigrams": self.bigrams,
            "n_docs": int(self.doc_counts.sum()),
        }
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1)
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        os.rename(tmp, path)

    @staticmethod
    def load(path: str) -> "NBModel":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        w = np.load(os.path.join(path, "weights.npz"))
        return NBModel(
            classes=list(meta["classes"]),
            dim=int(meta["dim"]),
            alpha=float(meta["alpha"]),
            bigrams=bool(meta["bigrams"]),
            doc_counts=w["doc_counts"],
            feature_counts=w["feature_counts"],
            log_prior=w["log_prior"],
            log_lik=w["log_lik"],
        )

    def payload(self) -> dict:
        """The broadcast slice of the model: what scoring needs, nothing
        else (the int64 count matrix stays behind)."""
        return {
            "classes": self.classes,
            "dim": self.dim,
            "bigrams": self.bigrams,
            "log_prior": self.log_prior,
            "log_lik": self.log_lik,
        }


def _count_partial(
    batch: pa.Table, label_col: str, text_col: str, class_idx: dict,
    dim: int, bigrams: bool,
) -> pa.Table:
    """Sparse per-batch count partial: rows of (key, count) where
    key = class·(dim+1)+bucket for feature counts and bucket == dim is the
    class's document count. Summable across batches because every (doc,
    token) lives in exactly one batch."""
    width = dim + 1
    labels = batch.column(label_col).to_numpy(zero_copy_only=False).astype(object)
    cls = np.array([class_idx[l] for l in labels], dtype=np.int64)
    buckets, rows, _ = _featurize(batch.column(text_col), dim, bigrams)
    keys = cls[rows] * width + buckets
    # per-class doc counts ride along as bucket == dim
    keys = np.concatenate([keys, cls * width + dim])
    uk, counts = np.unique(keys, return_counts=True)
    return pa.table(
        {"key": pa.array(uk, pa.int64()), "count": pa.array(counts, pa.int64())}
    )


def train_nb(
    ds: ray.data.Dataset,
    label_col: str = "lang",
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    alpha: float = 1.0,
    bigrams: bool = True,
    driver_limit: int = NB_DRIVER_LIMIT,
) -> NBModel:
    """Train in one distributed pass over (text, label) rows. Class
    discovery is a separate column-pruned ``unique`` over the label column
    only (labels are low-cardinality by nature; the text column never
    travels for it)."""
    classes = sorted(ds.select_columns([label_col]).unique(label_col))
    if not classes:
        raise ValueError("training dataset is empty")
    class_idx = {c: i for i, c in enumerate(classes)}
    C, width = len(classes), dim + 1

    partials = ds.map_batches(
        lambda b: _count_partial(b, label_col, text_col, class_idx, dim, bigrams),
        batch_format="pyarrow",
    ).materialize()

    counts = np.zeros(C * width, dtype=np.int64)
    if partials.count() <= driver_limit:
        t = pa.concat_tables(
            ray.get(ref) for ref in partials.to_arrow_refs()
        ).combine_chunks()
        np.add.at(
            counts,
            t.column("key").to_numpy(zero_copy_only=False),
            t.column("count").to_numpy(zero_copy_only=False),
        )
    else:
        from ray.data.aggregate import Sum

        reduced = partials.groupby("key").aggregate(
            Sum("count", alias_name="count")
        )
        t = pa.concat_tables(
            ray.get(ref) for ref in reduced.to_arrow_refs()
        ).combine_chunks()
        counts[t.column("key").to_numpy(zero_copy_only=False)] = t.column(
            "count"
        ).to_numpy(zero_copy_only=False)

    mat = counts.reshape(C, width)
    feature_counts = np.ascontiguousarray(mat[:, :dim])
    doc_counts = np.ascontiguousarray(mat[:, dim])
    total = doc_counts.sum()
    log_prior = np.log(doc_counts.astype(np.float64) / total)
    denom = feature_counts.sum(axis=1, keepdims=True).astype(np.float64) + alpha * dim
    log_lik = np.log(
        (feature_counts.astype(np.float64) + alpha) / denom
    ).astype(np.float32)
    return NBModel(
        classes=classes,
        dim=dim,
        alpha=alpha,
        bigrams=bigrams,
        doc_counts=doc_counts,
        feature_counts=feature_counts,
        log_prior=log_prior,
        log_lik=log_lik,
    )


def score_table(
    batch_text: pa.ChunkedArray | pa.Array,
    classes: list[str],
    dim: int,
    bigrams: bool,
    log_prior: np.ndarray,
    log_lik: np.ndarray,
    positive: str | None,
) -> dict[str, pa.Array]:
    """THE scoring kernel — both the actor pool and any driver-side path
    call this one function (the `_bm25_scores` convention: one copy of the
    float ops, bitwise-identical everywhere). Returns the output columns.

    Per class: one ``np.bincount(rows, weights=log_lik[c][buckets])`` —
    C vectorized reductions per batch, zero per-row Python. Ties (e.g. an
    empty doc under uniform priors) break to the lexicographically first
    class (argmax convention, classes are sorted)."""
    n = len(batch_text)
    buckets, rows, _ = _featurize(batch_text, dim, bigrams)
    C = len(classes)
    scores = np.empty((n, C), dtype=np.float64)
    for c in range(C):
        scores[:, c] = log_prior[c] + np.bincount(
            rows, weights=log_lik[c][buckets].astype(np.float64), minlength=n
        )
    pred = scores.argmax(axis=1)
    # stable softmax over class log-scores
    mx = scores.max(axis=1, keepdims=True)
    ex = np.exp(scores - mx)
    probs = ex / ex.sum(axis=1, keepdims=True)
    out = {
        "pred_label": pa.array(np.array(classes, dtype=object)[pred].astype(str)),
        "pred_prob": pa.array(probs[np.arange(n), pred], pa.float64()),
    }
    if positive is not None:
        out["p_positive"] = pa.array(probs[:, classes.index(positive)], pa.float64())
    return out


class NBScorer:
    """Broadcast-model scoring stage for ``map_batches(NBScorer,
    concurrency=N)``. The model arrives ONCE per actor — as an object-store
    ref (`ray.put` upstream; `ray.get` here is zero-copy for the weight
    matrix), as an in-process payload dict (tests / driver-side use), or as
    an on-disk model directory (CLI latency path, no re-broadcast)."""

    def __init__(
        self,
        model_ref=None,
        payload: dict | None = None,
        model_path: str | None = None,
        text_col: str = "text",
        positive: str | None = None,
    ):
        if model_ref is not None:
            payload = ray.get(model_ref)
        elif model_path is not None:
            payload = NBModel.load(model_path).payload()
        if payload is None:
            raise ValueError("NBScorer needs model_ref, payload, or model_path")
        self.classes = list(payload["classes"])
        self.dim = int(payload["dim"])
        self.bigrams = bool(payload["bigrams"])
        self.log_prior = payload["log_prior"]
        self.log_lik = payload["log_lik"]
        self.text_col = text_col
        self.positive = positive

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = score_table(
            batch.column(self.text_col),
            self.classes,
            self.dim,
            self.bigrams,
            self.log_prior,
            self.log_lik,
            self.positive,
        )
        for name, arr in cols.items():
            batch = batch.append_column(name, arr)
        return batch


def classify(
    ds: ray.data.Dataset,
    model: NBModel,
    text_col: str = "text",
    positive: str | None = None,
    min_prob: float | None = None,
    concurrency: int | tuple = (1, 8),
) -> ray.data.Dataset:
    """Score a corpus with a trained model; optionally keep only rows whose
    positive-class probability clears ``min_prob`` (the CCNet-style quality
    filter). One ``ray.put`` for the weights, however many actors run."""
    if positive is not None and positive not in model.classes:
        raise ValueError(f"positive class {positive!r} not in {model.classes}")
    ref = ray.put(model.payload())
    out = ds.map_batches(
        NBScorer,
        fn_constructor_kwargs={
            "model_ref": ref,
            "text_col": text_col,
            "positive": positive,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    if min_prob is not None:
        if positive is None:
            raise ValueError("min_prob filtering needs a positive class")
        thr = float(min_prob)
        out = out.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("p_positive"), thr)),
            batch_format="pyarrow",
        )
    return out
