"""Differential fuzz gate: seeded random queries, DataFrame API vs DuckDB.

Complements the 483 hand-written oracles: ``fuzzgen`` renders one seeded
AST through both the Spark Column/DataFrame layer and ANSI SQL on
DuckDB, and any divergence fails here with the seed and SQL attached —
fully reproducible (`gen_query(seed)` is pure).

Seed range is pinned; raise FUZZ_N locally (or run
``python tools/fuzz_sweep.py --n 2000``) for a deeper sweep.
"""

from __future__ import annotations

import os

import pytest

from dataengineeringutils_spark.fuzzgen import gen_query, run_case, to_sql
from tools.verify_local import duck_connect

FUZZ_N = int(os.environ.get("FUZZ_N", "120"))


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


def test_fuzz_differential(spark, sf_dir, duck):
    failures = []
    for seed in range(1, FUZZ_N + 1):
        r = run_case(spark, duck, sf_dir, seed)
        if not r["ok"]:
            failures.append(r)
    msg = "\n".join(
        f"seed {r['seed']}: {r['issues'][:2]}\n  {r['sql']}" for r in failures
    )
    assert not failures, f"{len(failures)}/{FUZZ_N} seeds diverged:\n{msg}"


def test_gen_query_deterministic():
    # same seed -> same AST -> same SQL; pins reproducibility of failures
    for seed in (1, 7, 42, 99):
        assert gen_query(seed) == gen_query(seed)
        assert to_sql(gen_query(seed)) == to_sql(gen_query(seed))


def test_shapes_all_reachable():
    shapes = {gen_query(s)["shape"] for s in range(1, 400)}
    assert shapes == {
        "global_agg", "group_agg", "proj", "join_agg",
        "left_join_agg", "setop", "window", "agg_of_agg",
        "semi_anti", "pivot", "asof", "interval_join",
    }
