"""Sequence packing: exact chunk contents, conservation, determinism."""

import numpy as np

import ray.data


def _toy_ds(n_docs=40, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        n = int(rng.integers(0, 900))
        rows.append(
            {"doc_id": i, "tokens": rng.integers(0, 1000, n).astype(np.int32).tolist()}
        )
    return rows


def test_packing_conserves_and_chunks(ray_session):
    from clickhouse_data_pipeline_ray.functions.packing import pack_token_sequences

    rows = _toy_ds()
    seq_len, nb = 128, 4
    packed = pack_token_sequences(
        ray.data.from_items(rows), seq_len=seq_len, n_buckets=nb
    ).to_pandas()

    for bucket in range(nb):
        docs = sorted(
            (r for r in rows if r["doc_id"] % nb == bucket), key=lambda r: r["doc_id"]
        )
        expect = np.concatenate(
            [np.asarray(r["tokens"], np.int32) for r in docs]
        ) if docs else np.empty(0, np.int32)
        got_chunks = packed[packed["bucket"] == bucket].sort_values("seq_index")
        if len(expect) == 0:
            assert got_chunks.empty
            continue
        # seq_index contiguous from 0
        assert got_chunks["seq_index"].tolist() == list(range(len(got_chunks)))
        # every chunk full except the last
        lens = got_chunks["n_tok"].tolist()
        assert all(l == seq_len for l in lens[:-1])
        assert 1 <= lens[-1] <= seq_len
        # EXACT content: concatenating chunks reproduces the doc stream
        got = np.concatenate([np.asarray(c, np.int32) for c in got_chunks["tokens"]])
        assert np.array_equal(got, expect)
        # n_tok matches the actual chunk payload
        assert lens == [len(c) for c in got_chunks["tokens"]]


def test_packing_deterministic_across_runs(ray_session):
    from clickhouse_data_pipeline_ray.functions.packing import pack_token_sequences

    rows = _toy_ds(seed=11)
    a = (
        pack_token_sequences(ray.data.from_items(rows), seq_len=64, n_buckets=3)
        .to_pandas()
        .sort_values(["bucket", "seq_index"])
        .reset_index(drop=True)
    )
    b = (
        pack_token_sequences(ray.data.from_items(rows), seq_len=64, n_buckets=3)
        .to_pandas()
        .sort_values(["bucket", "seq_index"])
        .reset_index(drop=True)
    )
    assert a["n_tok"].tolist() == b["n_tok"].tolist()
    assert all(list(x) == list(y) for x, y in zip(a["tokens"], b["tokens"]))


def test_tokenize_words_counts_match_regex(ray_session):
    """_tokenize_words token counts must equal the SQL regexp_extract_all
    count (the invariant the pack_sequences oracle depends on)."""
    import duckdb
    import pyarrow as pa

    from clickhouse_data_pipeline_ray.pipelines.queries import _tokenize_words

    texts = [
        "hello world 123",
        "",
        "   ",
        "a,b;c--d",
        "über café 東京 ok",  # non-ASCII chars are delimiters for this regex
        "trailing space ",
        "123abc 456def",
    ]
    b = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = _tokenize_words(b)
    got = [len(t) for t in out.column("tokens").to_pylist()]
    want = [
        duckdb.sql(
            "SELECT len(regexp_extract_all(?, '[A-Za-z0-9]+'))", params=[t]
        ).fetchone()[0]
        for t in texts
    ]
    assert got == want


def test_packing_accepts_string_keys(ray_session):
    """The engine's own snapshot tables key docs by STRING doc_id — packing
    must hash-bucket them instead of crashing on a blind int cast, and still
    conserve every token."""
    from clickhouse_data_pipeline_ray.functions.packing import pack_token_sequences

    rows = [
        {"doc_id": f"web-{i:05d}", "tokens": list(range(i, i + 30))}
        for i in range(25)
    ]
    packed = pack_token_sequences(
        ray.data.from_items(rows), seq_len=16, n_buckets=4
    ).to_pandas()
    total_in = sum(len(r["tokens"]) for r in rows)
    assert int(packed["n_tok"].sum()) == total_in
    # within a bucket the final chunk is the only short one
    for _, g in packed.groupby("bucket"):
        short = (g["n_tok"] < 16).sum()
        assert short <= 1
