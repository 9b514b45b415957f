"""Streaming differential fuzz gate (SURVEY §5; round-7 VERDICT #4).

Runs the first seeds of the same deterministic sequence the deep sweep
(tools/stream_fuzz_sweep.py -> STREAMFUZZ.json) uses: each case executes
as a REAL Structured Streaming job (micro-batched file source, append
mode, watermark), as the equivalent batch plan plus the pinned emission
predicate, and as a DuckDB oracle — all three must agree exactly.
"""

from __future__ import annotations

import pytest

from dataengineeringutils_spark.streamfuzz import (
    gen_foreachbatch_case,
    gen_recovery_case,
    gen_stateful_case,
    gen_stream_case,
    run_foreachbatch_case,
    run_recovery_case,
    run_stateful_case,
    run_stream_case,
)
from tools.verify_local import duck_connect

SF = "/root/testdata/sf0.001"
N_SEEDS = 10
N_STATEFUL_SEEDS = 6
N_FOREACHBATCH_SEEDS = 6
N_RECOVERY_SEEDS = 6


@pytest.fixture(scope="module")
def duck():
    return duck_connect(SF)


@pytest.mark.parametrize("seed", range(1, N_SEEDS + 1))
def test_stream_fuzz_seed(spark, duck, seed):
    r = run_stream_case(spark, duck, SF, seed)
    assert r["ok"], (r["shape"], r["issues"][:3], r["sql"])


@pytest.mark.parametrize("seed", range(1, N_STATEFUL_SEEDS + 1))
def test_stream_fuzz_stateful_seed(spark, duck, seed):
    """Round-9 width: stream-stream interval join and
    dropDuplicatesWithinWatermark — the state-eviction paths where an
    off-by-one silently drops rows (see streamfuzz.py's soundness
    argument for why stream == batch by construction)."""
    r = run_stateful_case(spark, duck, SF, seed)
    assert r["ok"], (r["shape"], r["issues"][:3])


@pytest.mark.parametrize("seed", range(1, N_FOREACHBATCH_SEEDS + 1))
def test_stream_fuzz_foreachbatch_seed(spark, duck, seed):
    """Round-10 width: the foreachBatch sink mechanics — MERGE-upsert
    keyed-table state and txn-idempotent log appends, both with injected
    crash-window replays (see streamfuzz.py's order-robustness argument
    for why stream == batch for ANY delivery order and replay set)."""
    r = run_foreachbatch_case(spark, duck, SF, seed)
    assert r["ok"], (r["shape"], r["issues"][:3])


def test_foreachbatch_gen_is_deterministic_and_covers_shapes():
    cases = [gen_foreachbatch_case(s) for s in range(1, 200)]
    assert cases == [gen_foreachbatch_case(s) for s in range(1, 200)]
    assert {c["shape"] for c in cases} == {"upsert", "txn_sink"}
    # replayed upserts, multi-batch replay sets, and checkpoint-crossing
    # replays all occur in the first 200 seeds
    assert any(
        c["shape"] == "upsert" and c["replay"] is not None and c["n_batches"] > 2
        for c in cases
    )
    assert any(
        c["shape"] == "txn_sink"
        and len(c["replay_set"]) > 1
        and c["ckpt_before_replay"]
        for c in cases
    )


@pytest.mark.parametrize("seed", range(1, N_RECOVERY_SEEDS + 1))
def test_stream_fuzz_recovery_seed(spark, duck, seed):
    """Round-11 width: checkpoint recovery — each seed stops a real
    streaming query, restarts it from its checkpoint (half the seeds
    with the newest commit-log entry deleted, forcing a replay of the
    last micro-batch through the file sink's manifest dedupe), and
    compares the settled sink against batch + DuckDB."""
    r = run_recovery_case(spark, duck, SF, seed)
    assert r["ok"], (r["shape"], r["issues"][:3])


def test_recovery_gen_is_deterministic_and_covers_modes():
    cases = [gen_recovery_case(s) for s in range(1, 200)]
    assert cases == [gen_recovery_case(s) for s in range(1, 200)]
    assert {c["unclean"] for c in cases} == {True, False}
    assert all(1 <= c["kill_after"] < c["n_batches"] for c in cases)
    assert {c["shape"] for c in cases} == {"tumbling", "sliding", "session"}


def test_gen_is_deterministic_and_covers_shapes():
    cases = [gen_stream_case(s) for s in range(1, 200)]
    again = [gen_stream_case(s) for s in range(1, 200)]
    assert cases == again
    shapes = {c["shape"] for c in cases}
    assert shapes == {"tumbling", "sliding", "session"}
    # displaced-tail (out-of-order arrival) and multi-batch cases occur
    assert any(c["displace"] and c["n_batches"] > 1 for c in cases)


def test_stateful_gen_is_deterministic_and_covers_shapes():
    cases = [gen_stateful_case(s) for s in range(1, 200)]
    assert cases == [gen_stateful_case(s) for s in range(1, 200)]
    assert {c["shape"] for c in cases} == {"ssjoin", "dedup_wm"}
    # out-of-order arrival against join state, and multi-copy dup tails
    assert any(
        c["shape"] == "ssjoin" and c["displace"] and c["n_batches"] > 2
        for c in cases
    )
    assert any(
        c["shape"] == "dedup_wm" and c["dup_tail"] > 1 and c["n_batches"] > 2
        for c in cases
    )
