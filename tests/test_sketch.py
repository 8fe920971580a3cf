"""t-digest quantile sketch: merge associativity + rank-error bound against
DuckDB's exact quantile_cont on the real testdata column."""

import duckdb
import numpy as np

import ray.data

SF_DIR = "/root/testdata/sf0.001"


def test_tdigest_rank_error_bound_vs_duckdb(ray_session):
    from clickhouse_data_pipeline_ray.functions.sketch import quantile_sketch

    ds = ray.data.read_parquet(f"{SF_DIR}/events.parquet", columns=["value"])
    d = quantile_sketch(ds, "value")

    con = duckdb.connect()
    exact_vals = np.sort(
        con.execute(
            f"SELECT value FROM read_parquet('{SF_DIR}/events.parquet')"
        ).df()["value"].to_numpy()
    )
    n = len(exact_vals)
    assert abs(d.total_weight - n) < 1e-6

    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = d.quantile(q)
        exact = con.execute(
            f"SELECT quantile_cont(value, {q}) FROM read_parquet('{SF_DIR}/events.parquet')"
        ).fetchone()[0]
        # rank-error bound: the estimate's rank must sit within 1% of q
        rank = np.searchsorted(exact_vals, est) / n
        assert abs(rank - q) <= 0.01, (q, est, exact, rank)


def test_tdigest_merge_matches_single_build():
    """Merging per-chunk digests must track the single-pass digest (both
    within the rank-error bound of the exact quantiles)."""
    from clickhouse_data_pipeline_ray.functions.sketch import TDigest

    rng = np.random.default_rng(7)
    v = rng.lognormal(size=100_000)
    sv = np.sort(v)
    single = TDigest.from_values(v)
    merged = TDigest.merge_all(
        [TDigest.from_values(c) for c in np.array_split(v, 37)]
    )
    for q in (0.05, 0.5, 0.95, 0.999):
        for d in (single, merged):
            rank = np.searchsorted(sv, d.quantile(q)) / len(sv)
            assert abs(rank - q) <= 0.005, (q, rank)


def test_tdigest_bounded_state():
    """Centroid count stays O(delta) no matter the input size (the mergeable
    -sketch contract: driver state independent of corpus size)."""
    from clickhouse_data_pipeline_ray.functions.sketch import TDigest

    rng = np.random.default_rng(3)
    d = TDigest.from_values(rng.normal(size=500_000), delta=100.0)
    assert len(d.means) <= 220  # ~2x delta worst case

    empty = TDigest.from_values(np.array([]))
    assert np.isnan(empty.quantile(0.5))
    one = TDigest.from_values(np.array([42.0]))
    assert one.quantile(0.9) == 42.0


def test_hll_error_bound_across_cardinalities():
    """|estimate - n| <= 3 sigma where sigma = 1.04/sqrt(m), across small
    (linear-counting) and large (raw-HLL) ranges."""
    import numpy as np

    from clickhouse_data_pipeline_ray.functions.sketch import HyperLogLog

    p = 14
    sigma = 1.04 / np.sqrt(1 << p)
    for n in (100, 5_000, 100_000, 1_000_000):
        hll = HyperLogLog(p).add_values(np.arange(n, dtype=np.int64))
        est = hll.estimate()
        assert abs(est - n) / n <= 3 * sigma + 1e-9, (n, est)


def test_hll_merge_order_invariant_and_matches_single_build():
    import numpy as np

    from clickhouse_data_pipeline_ray.functions.sketch import HyperLogLog

    rng = np.random.default_rng(7)
    values = rng.integers(0, 50_000, 200_000)
    single = HyperLogLog(12).add_values(values)
    chunks = np.array_split(values, 7)
    a = HyperLogLog(12)
    for c in chunks:
        a.merge(HyperLogLog(12).add_values(c))
    b = HyperLogLog(12)
    for c in reversed(chunks):
        b.merge(HyperLogLog(12).add_values(c))
    assert np.array_equal(a.registers, single.registers)
    assert np.array_equal(b.registers, single.registers)


def test_hll_string_and_int_hashing_distinct():
    import numpy as np

    from clickhouse_data_pipeline_ray.functions.sketch import HyperLogLog

    h = HyperLogLog(14).add_values(np.array(["u%d" % i for i in range(20_000)], dtype=object))
    assert abs(h.estimate() - 20_000) / 20_000 < 0.03


def test_distinct_sketch_grouped_vs_exact(ray_session):
    """Distributed grouped HLL within 3 sigma of DuckDB's exact distinct."""
    import duckdb
    import numpy as np
    import ray

    from clickhouse_data_pipeline_ray.functions.sketch import distinct_sketch

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/events.parquet", columns=["user_id", "event_type"])
    got = distinct_sketch(ds, "user_id", group_col="event_type", p=14)
    exact = duckdb.sql(
        f"""SELECT event_type AS "group", count(DISTINCT user_id) AS n
            FROM read_parquet('{sf}/events.parquet') GROUP BY 1 ORDER BY 1"""
    ).df()
    sigma = 1.04 / np.sqrt(1 << 14)
    merged = got.merge(exact, on="group")
    assert len(merged) == len(exact)
    for _, r in merged.iterrows():
        assert abs(r.n_distinct_approx - r.n) / max(r.n, 1) <= 3 * sigma + 1e-9, dict(r)


def test_heavy_hitters_exact_when_under_k():
    import numpy as np

    from clickhouse_data_pipeline_ray.functions.sketch import HeavyHitters

    vals = np.repeat(np.arange(20), np.arange(1, 21))
    hh = HeavyHitters.from_values(vals, k=64)
    top = dict(hh.top(20))
    assert top == {i: i + 1 for i in range(20)}


def test_heavy_hitters_zipf_guarantees():
    """Every value with true freq > N/k is present; estimates lie in
    [true - N/k, true] — after merging chunked partials in any order."""
    import numpy as np

    from clickhouse_data_pipeline_ray.functions.sketch import HeavyHitters

    rng = np.random.default_rng(42)
    vals = rng.zipf(1.3, 100_000)
    vals = vals[vals < 10_000]
    n = len(vals)
    k = 128
    true = {}
    u, c = np.unique(vals, return_counts=True)
    true = dict(zip(u.tolist(), c.tolist()))

    for order in (1, -1):
        hh = HeavyHitters(k)
        for chunk in np.array_split(vals, 13)[::order]:
            hh.merge(HeavyHitters.from_values(chunk, k))
        est = dict(zip(hh.values.tolist(), hh.counts.tolist()))
        bound = n / k
        for v, t in true.items():
            if t > bound:
                assert v in est, (v, t, bound)
            if v in est:
                assert t - bound <= est[v] <= t, (v, t, est[v], bound)


def test_heavy_hitters_distributed_vs_exact(ray_session):
    import duckdb
    import ray

    from clickhouse_data_pipeline_ray.functions.sketch import heavy_hitters_sketch

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/events.parquet", columns=["user_id"])
    hh = heavy_hitters_sketch(ds, "user_id", k=512)
    exact = dict(
        duckdb.sql(
            f"SELECT user_id, count(*) FROM read_parquet('{sf}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    n = sum(exact.values())
    bound = n / 512
    est = dict(zip(hh.values.tolist(), hh.counts.tolist()))
    for v, t in exact.items():
        if t > bound:
            assert v in est, (v, t, bound)
        if v in est:
            assert t - bound <= est[v] <= t, (v, t, est[v])


def test_distinct_sketch_non_string_group_col(ray_session):
    """distinct_sketch groups by a column of ANY type (the group column used
    to be force-cast to pa.string(), raising on int group keys), and empty
    blocks emit typed partials."""
    import pyarrow as pa

    from clickhouse_data_pipeline_ray.functions.sketch import distinct_sketch

    t = pa.table(
        {
            "g": pa.array([1, 1, 2, 2, 2], pa.int64()),
            "u": pa.array(["a", "b", "a", "b", "c"]),
        }
    )
    ds = ray.data.from_arrow([t, t.schema.empty_table()])
    out = distinct_sketch(ds, "u", group_col="g")
    got = dict(zip(out["group"], out["n_distinct_approx"]))
    assert got == {1: 2, 2: 3}


def test_heavy_hitters_sketch_empty_block_typed(ray_session):
    """heavy_hitters_sketch partials keep the source column's type for empty
    blocks (a null-typed 'v' broke block-schema unification)."""
    import pyarrow as pa

    from clickhouse_data_pipeline_ray.functions.sketch import heavy_hitters_sketch

    t = pa.table({"v": pa.array([5, 5, 5, 7, 9], pa.int64())})
    ds = ray.data.from_arrow([t, t.schema.empty_table()])
    hh = heavy_hitters_sketch(ds, "v", k=3)
    top = dict(zip([int(x) for x in hh.values], [int(c) for c in hh.counts]))
    assert top.get(5, 0) >= 1  # the true heavy hitter survives
