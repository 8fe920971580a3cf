"""Property-based pinning of the LWW kernel (hypothesis): for ANY event
sequence and ANY partitioning of it into batches/files, hierarchical
compaction equals one global pass equals the dict-replay oracle. This is the
associativity argument the whole engine rests on (per-batch pre-compaction,
salted sub-groups, delta chains are all just re-bracketings)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from clickhouse_data_pipeline_ray.schemas import SNAPSHOT_SCHEMA
from clickhouse_data_pipeline_ray.stages.merge import (
    lww_compact,
    merge_file_tables,
)

KEYS = [f"d{i}" for i in range(8)]  # small key space → many collisions


@st.composite
def event_log(draw):
    n = draw(st.integers(min_value=0, max_value=60))
    keys = draw(st.lists(st.sampled_from(KEYS), min_size=n, max_size=n))
    ops = draw(st.lists(st.sampled_from(["c", "u", "d"]), min_size=n, max_size=n))
    # unique LSNs in random order (generator guarantees uniqueness)
    lsns = draw(st.permutations(list(range(1, n + 1)))) if n else []
    return keys, ops, list(lsns)


def _table(keys, ops, lsns):
    n = len(keys)
    return pa.table(
        {
            "lsn": pa.array(lsns, pa.int64()),
            "doc_id": pa.array(keys, pa.string()),
            "tokens": pa.array([[i] for i in range(n)], pa.list_(pa.int32())),
            "n_tok": pa.array([1] * n, pa.int32()),
            "source": pa.array(["s"] * n, pa.string()),
            "op": pa.array(ops, pa.string()),
        }
    )


def _oracle(keys, ops, lsns):
    state = {}
    for key, op, lsn in sorted(zip(keys, ops, lsns), key=lambda t: t[2]):
        state[key] = (op, lsn)
    alive = sorted(k for k, (op, _l) in state.items() if op != "d")
    return alive, {k: state[k][1] for k in alive}


@settings(max_examples=120, deadline=None)
@given(event_log(), st.integers(min_value=1, max_value=5), st.data())
def test_any_bracketing_matches_oracle(log, n_chunks, data):
    keys, ops, lsns = log
    t = _table(keys, ops, lsns)

    # random bracketing into LSN-ordered "files" (like delta chains)
    order = np.argsort(np.array(lsns)) if lsns else np.array([], dtype=int)
    sorted_t = t.take(pa.array(order)) if len(order) else t
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(0, max(0, t.num_rows)),
                min_size=n_chunks - 1,
                max_size=n_chunks - 1,
            )
        )
    )
    bounds = [0] + cuts + [t.num_rows]
    chunks = [
        lww_compact(sorted_t.slice(a, b - a)) for a, b in zip(bounds, bounds[1:])
    ]
    merged = merge_file_tables(chunks, SNAPSHOT_SCHEMA)

    alive, winning_lsn = _oracle(keys, ops, lsns)
    assert merged.column("doc_id").to_pylist() == alive
    assert merged.column("lsn").to_pylist() == [winning_lsn[k] for k in alive]

    # one global pass agrees with the bracketed pass
    direct = merge_file_tables([t], SNAPSHOT_SCHEMA)
    assert direct.equals(merged)
