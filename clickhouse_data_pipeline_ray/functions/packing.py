"""Token-sequence packing: concatenate documents' token ids into fixed-length
training sequences (the GPT-pretraining "sample packing" step).

Scale shape: docs are hash/modulo-bucketed on the key into independent pack
groups; each group deterministically orders its docs (by key), concatenates
their token ids, and chunks the stream into ``seq_len``-sized sequences —
documents cross sequence boundaries, no padding except the final partial
chunk per bucket. One shuffle (the groupby), one vectorized pass per group;
packing is embarrassingly parallel across buckets, and each bucket's output
is reproducible in isolation (a failed bucket can be re-packed alone —
resumable-output friendly).

The reference has no packing analog (its payloads stop at the ClickHouse
sink); this is part of the beyond-reference training-data surface
(SURVEY.md "beyond" items).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def pack_token_sequences(
    ds: ray.data.Dataset,
    tokens_col: str = "tokens",
    key_col: str = "doc_id",
    seq_len: int = 512,
    n_buckets: int = 16,
) -> ray.data.Dataset:
    """Pack a (key, list<int>) dataset into fixed-length sequences.

    Returns rows ``(bucket, seq_index, n_tok, tokens)`` where ``tokens`` is a
    list<int32> of exactly ``seq_len`` ids except the final (partial)
    sequence of each bucket. Deterministic: bucket = key % n_buckets for
    integer keys, SipHash(key) % n_buckets for string keys (the engine's own
    snapshot tables key docs by STRING doc_id — a blind int cast crashed on
    them); docs pack in ascending key order within a bucket either way.
    """

    def add_bucket(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).to_numpy(zero_copy_only=False)
        if keys.dtype.kind in "iu":
            bucket = (keys.astype(np.int64) % n_buckets).astype(np.int32)
        else:
            from ..stages.partition import key_hash

            bucket = (key_hash(b.column(key_col)) % np.uint64(n_buckets)).astype(
                np.int32
            )
        return pa.table(
            {
                key_col: b.column(key_col),
                tokens_col: b.column(tokens_col),
                "bucket": pa.array(bucket),
            }
        )

    def pack_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_col)
        parts = [np.asarray(t, dtype=np.int32) for t in g[tokens_col]]
        flat = np.concatenate(parts) if parts else np.empty(0, np.int32)
        if len(flat) == 0:
            return pd.DataFrame(
                {"bucket": [], "seq_index": [], "n_tok": [], "tokens": []}
            )
        n_seq = (len(flat) + seq_len - 1) // seq_len
        chunks = [flat[i * seq_len : (i + 1) * seq_len] for i in range(n_seq)]
        return pd.DataFrame(
            {
                "bucket": np.full(n_seq, int(g["bucket"].iloc[0]), dtype=np.int32),
                "seq_index": np.arange(n_seq, dtype=np.int64),
                "n_tok": np.array([len(c) for c in chunks], dtype=np.int64),
                "tokens": [c.tolist() for c in chunks],
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack_block, batch_format="pandas")
    )
