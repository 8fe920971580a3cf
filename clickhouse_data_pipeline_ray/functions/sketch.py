"""Mergeable quantile sketch (t-digest) for unbounded double domains.

``doc_length_percentiles`` computes EXACT distributed percentiles via value
histograms, which requires a bounded discrete domain (ints). For continuous
columns (e.g. ``events.value``) that state is O(rows); the scalable analog is
a MERGEABLE sketch: each batch reduces to a bounded centroid set, partials
merge associatively, and only O(blocks × delta) centroids ever reach the
driver regardless of corpus size (tree-merge the partials on a 256-node
cluster if even that is too many — merging is associative).

Implementation: the merging t-digest of Dunning & Ertl ("Computing extremely
accurate quantiles using t-digests", arXiv:1902.04023) with the k1 scale
function k(q) = δ/(2π)·asin(2q−1), which bounds each centroid's k-width by 1
— rank error is ~O(1/δ) mid-range and tighter at the tails. Both the
per-batch build and the merge are vectorized (sort → integer k-bin →
reduceat); no Python loop over values or centroids.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _k_scale(q: np.ndarray, delta: float) -> np.ndarray:
    return (delta / (2 * np.pi)) * np.arcsin(np.clip(2 * q - 1, -1.0, 1.0))


def _cluster(means: np.ndarray, weights: np.ndarray, delta: float) -> tuple[np.ndarray, np.ndarray]:
    """Re-cluster (mean, weight) centroids sorted by mean into k1-scale bins
    (vectorized): a centroid boundary falls wherever the cumulative k value
    crosses an integer, so every output centroid has k-width ≤ 1."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    if total == 0:
        return means[:0], weights[:0]
    q_right = np.cumsum(weights) / total
    bins = np.floor(_k_scale(q_right, delta) + 0.5 * (2.0 / delta)).astype(np.int64)
    # boundaries where the bin id changes; reduceat over the runs
    starts = np.flatnonzero(np.r_[True, bins[1:] != bins[:-1]])
    w_out = np.add.reduceat(weights, starts)
    m_out = np.add.reduceat(means * weights, starts) / w_out
    return m_out, w_out


class TDigest:
    """Immutable centroid set; construct via from_values / merge_all."""

    def __init__(self, means: np.ndarray, weights: np.ndarray, delta: float = 200.0):
        self.means = np.asarray(means, dtype=np.float64)
        self.weights = np.asarray(weights, dtype=np.float64)
        self.delta = float(delta)

    @classmethod
    def from_values(cls, values: np.ndarray, delta: float = 200.0) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return cls(np.empty(0), np.empty(0), delta)
        m, w = _cluster(v, np.ones(len(v)), delta)
        return cls(m, w, delta)

    @classmethod
    def merge_all(cls, digests: list["TDigest"], delta: float = 200.0) -> "TDigest":
        ms = [d.means for d in digests if len(d.means)]
        ws = [d.weights for d in digests if len(d.means)]
        if not ms:
            return cls(np.empty(0), np.empty(0), delta)
        m, w = _cluster(np.concatenate(ms), np.concatenate(ws), delta)
        return cls(m, w, delta)

    @property
    def total_weight(self) -> float:
        return float(self.weights.sum())

    def quantile(self, q: float) -> float:
        """Interpolated value at quantile q (centroid-midpoint convention)."""
        n = len(self.means)
        if n == 0:
            return float("nan")
        if n == 1:
            return float(self.means[0])
        total = self.weights.sum()
        t = q * total
        cum_mid = np.cumsum(self.weights) - self.weights / 2.0
        i = int(np.searchsorted(cum_mid, t))
        if i <= 0:
            return float(self.means[0])
        if i >= n:
            return float(self.means[-1])
        c0, c1 = cum_mid[i - 1], cum_mid[i]
        m0, m1 = self.means[i - 1], self.means[i]
        frac = 0.0 if c1 == c0 else (t - c0) / (c1 - c0)
        return float(m0 + (m1 - m0) * frac)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (exact — no float log2,
    which loses precision above 2^53)."""
    x = x.astype(np.uint64, copy=True)
    nz = x != 0
    cnt = np.full(x.shape, 64, dtype=np.int64)
    cnt[nz] = 0
    for s in (32, 16, 8, 4, 2, 1):
        m = nz & ((x >> np.uint64(64 - s)) == 0)
        cnt[m] += s
        x[m] <<= np.uint64(s)
    return cnt


class HyperLogLog:
    """Mergeable approximate-distinct sketch — the ClickHouse ``uniq()``
    analog (Flajolet et al. 2007, with the HLL++ small-range linear-counting
    correction). ``p`` index bits → m=2^p one-byte registers; standard error
    ≈ 1.04/sqrt(m) (~0.81% at the default p=14, 16 KiB of state).

    Registers merge by elementwise max (associative + commutative), so
    per-batch partials combine in any order / any tree shape — only O(blocks)
    × 2^p bytes ever reach the driver regardless of corpus size. Hashing is
    SipHash (pandas hash_array) — deterministic across processes."""

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        if not 4 <= p <= 18:
            raise ValueError(f"p={p} out of range [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = (
            np.zeros(self.m, dtype=np.uint8) if registers is None else registers
        )

    def add_hashed(self, h: np.ndarray) -> "HyperLogLog":
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h << np.uint64(self.p)
        rank = np.where(w == 0, 64 - self.p + 1, _clz64(w) + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def add_values(self, values: np.ndarray) -> "HyperLogLog":
        from pandas.util import hash_array

        v = np.asarray(values)
        if v.dtype == object or v.dtype.kind in "USO":
            h = hash_array(v.astype(object), categorize=False)
        else:
            h = hash_array(v, categorize=False)
        return self.add_hashed(h)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError(f"cannot merge p={other.p} into p={self.p}")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting (small range)
        return float(raw)


def distinct_sketch(
    ds: ray.data.Dataset, col: str, group_col: str | None = None, p: int = 14
) -> pd.DataFrame:
    """Distributed approximate COUNT(DISTINCT col) [GROUP BY group_col] via
    HyperLogLog: one streamed pass, each batch emitting one register blob per
    group (group count must be driver-small — the `_partial_groupby`
    contract); the driver merges by elementwise max. The column itself never
    shuffles. Returns (group, n_distinct_approx)."""

    def partial(b: pa.Table) -> pa.Table:
        vals = b.column(col).to_numpy(zero_copy_only=False)
        if group_col is None:
            groups, codes = np.array(["_all"], dtype=object), np.zeros(len(vals), np.int64)
        else:
            groups, codes = np.unique(
                b.column(group_col).to_numpy(zero_copy_only=False), return_inverse=True
            )
        blobs = []
        for gi in range(len(groups)):  # O(groups) per batch, never O(rows)
            blobs.append(
                HyperLogLog(p).add_values(vals[codes == gi]).registers.tobytes()
            )
        # group column keeps the SOURCE column's arrow type (a string cast
        # raised on int group keys; a null-typed empty would break block
        # unification)
        gtype = pa.string() if group_col is None else b.schema.field(group_col).type
        return pa.table(
            {
                "group": pa.array(groups.tolist(), gtype),
                "regs": pa.array(blobs, pa.binary()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for group, sub in parts.groupby("group"):
        hll = HyperLogLog(p)
        for blob in sub["regs"]:
            hll.merge(HyperLogLog(p, np.frombuffer(blob, dtype=np.uint8).copy()))
        out.append((group, int(round(hll.estimate()))))
    return pd.DataFrame(out, columns=["group", "n_distinct_approx"]).sort_values(
        "group"
    ).reset_index(drop=True)


def _mg_summarize(values: np.ndarray, counts: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Misra–Gries reduction of exact (value, count) pairs to ≤ k-1 entries:
    keep the k-1 largest counts and subtract the k-th largest from each
    (equivalent to decrementing all counters whenever a k-th distinct value
    arrives). Guarantees count_est ∈ [true - N/k, true] for every value."""
    if len(values) < k:
        return values, counts
    order = np.argsort(counts, kind="stable")[::-1]
    values, counts = values[order], counts[order]
    dec = counts[k - 1]
    keep = counts[: k - 1] - dec
    nz = keep > 0
    return values[: k - 1][nz], keep[nz]


class HeavyHitters:
    """Mergeable Misra–Gries / SpaceSaving heavy-hitters sketch — the
    ClickHouse ``topK()`` analog (Misra & Gries 1982; merge rule from
    Agarwal et al., "Mergeable Summaries", PODS 2012). State is ≤ k-1
    (value, count) pairs; merging concatenates and re-reduces, preserving the
    deterministic error bound |est - true| ≤ N/k over the TOTAL stream length
    N. Any value with true frequency > N/k is guaranteed present."""

    def __init__(self, k: int = 64, values: np.ndarray | None = None, counts: np.ndarray | None = None):
        if k < 2:
            raise ValueError(f"k={k} must be >= 2")
        self.k = k
        self.values = np.empty(0, dtype=object) if values is None else values
        self.counts = np.empty(0, dtype=np.int64) if counts is None else counts

    @classmethod
    def from_values(cls, raw: np.ndarray, k: int = 64) -> "HeavyHitters":
        vals, cnts = np.unique(np.asarray(raw, dtype=object), return_counts=True)
        v, c = _mg_summarize(vals, cnts.astype(np.int64), k)
        return cls(k, v, c)

    def merge(self, other: "HeavyHitters") -> "HeavyHitters":
        if other.k != self.k:
            raise ValueError(f"cannot merge k={other.k} into k={self.k}")
        vals = np.concatenate([self.values, other.values])
        cnts = np.concatenate([self.counts, other.counts])
        # same value may appear in both partials: combine exactly first
        uvals, inv = np.unique(vals, return_inverse=True)
        ucnts = np.bincount(inv, weights=cnts).astype(np.int64)
        self.values, self.counts = _mg_summarize(uvals, ucnts, self.k)
        return self

    def top(self, n: int) -> list[tuple[object, int]]:
        order = np.lexsort((self.values, -self.counts))[:n]
        return [(self.values[i], int(self.counts[i])) for i in order]


def heavy_hitters_sketch(
    ds: ray.data.Dataset, col: str, k: int = 64
) -> HeavyHitters:
    """Distributed heavy hitters over a column of ANY cardinality: each batch
    reduces to ≤ k-1 (value, count) pairs (one np.unique, no Python loop over
    rows), the driver merges O(blocks × k) pairs — the column itself never
    shuffles, unlike an exact groupby().count() top-k."""

    def partial(b: pa.Table) -> pa.Table:
        hh = HeavyHitters.from_values(
            b.column(col).to_numpy(zero_copy_only=False), k
        )
        # 'v' keeps the source column's arrow type: an empty batch's
        # pa.array([]) would infer null and break block-schema unification
        return pa.table(
            {
                "v": pa.array(list(hh.values), b.schema.field(col).type),
                "c": pa.array(hh.counts, pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = HeavyHitters(k)
    for _, sub in parts.groupby(np.arange(len(parts)) // max(1, k - 1)):
        out.merge(
            HeavyHitters(
                k,
                sub["v"].to_numpy().astype(object),
                sub["c"].to_numpy().astype(np.int64),
            )
        )
    return out


def quantile_sketch(
    ds: ray.data.Dataset, col: str, delta: float = 200.0
) -> TDigest:
    """Distributed t-digest over a double column: one streamed pass, each
    batch emitting its centroid set as a single (means, weights) list row;
    the driver merge sees O(blocks × delta) centroids, never raw values."""

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        d = TDigest.from_values(v, delta)
        return pa.table(
            {
                "mean": pa.array([d.means.tolist()], pa.list_(pa.float64())),
                "weight": pa.array([d.weights.tolist()], pa.list_(pa.float64())),
            }
        )

    parts: pd.DataFrame = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    digests = [
        TDigest(np.asarray(m), np.asarray(w), delta)
        for m, w in zip(parts["mean"], parts["weight"])
    ]
    return TDigest.merge_all(digests, delta)
