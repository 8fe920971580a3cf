"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clickhouse_data_pipeline_ray.pipelines import queries as Q


def entry() -> Any:
    """Flagship pipeline: full CDC replay (generate deterministic WAL →
    normalize → hash-shuffle → LWW merge actor pool → exactly-once commit)
    sized to sf0.001, returning the committed snapshot."""
    return Q.cdc_replay("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 plus the
    training-data operators (dedup / similarity / text / multimodal)."""
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column
    names, fixed-point integer aggregates for hash-stable comparison) —
    ALL 50 queries() entries since round 5: sketch_profile now hashes the
    Misra–Gries exact regime (its approximate families run in-query with
    bounds assertions; tight error bounds stay in tests/test_sketch.py).

    Includes the flagship CDC replay family: their oracles read the same
    deterministic WAL parquet (generated here if absent) that the Ray
    pipeline replays, as a DuckDB ``arg_max`` LWW reduction. The dedup
    family (MinHash / SimHash / n-gram / embedding) is exactly SQL-checked
    via shared deterministic fixtures; approximate-sketch semantics are
    pinned by tests/.

    CONTRACT: the driver evaluates queries() at sf0.01, so the CDC oracles
    bake WAL paths sized to that scale factor. If the driver ever moves to a
    different sf, set GRAFT_ORACLE_SF_DIR to the matching directory — both
    sides derive their WALs from the same _cdc_params(sf_dir), so they stay
    in lockstep."""
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    return Q.build_oracle_sql(sf_dir)
