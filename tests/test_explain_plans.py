"""Physical-plan snapshot tests — the 100 TB contract, asserted.

Correctness is the oracle gate's job (tools/verify_local.py); these tests
pin the PLAN properties that make each operator survive a 1000-executor
scale-up: filters reaching the parquet scan, small sides broadcast, hot
relational paths staying JVM-side (no Python eval), window group-limits
kicking in for ranked top-k, and single-shuffle aggregation shapes.

A regression here means "still right, but no longer right AT SCALE" —
exactly the class of bug row-count tests can't see.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from dataengineeringutils_spark.registry import queries


def plan_of(spark, sf_dir: str, name: str, mode: str = "formatted") -> str:
    df = queries()[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def tree_of(spark, sf_dir: str, name: str) -> str:
    """Just the operator tree (formatted mode repeats node names in the
    per-node detail section, which would double substring counts)."""
    return plan_of(spark, sf_dir, name).split("\n\n")[0]


def test_filter_predicates_pushed_to_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "filter_predicates")
    assert "PushedFilters: [" in plan
    # At least one real predicate reached the parquet reader.
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), plan


def test_project_compute_prunes_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "project_compute")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = m.group(1)
    # lineitem has 16 columns; the projection needs far fewer.
    assert len(read_cols.split(",")) <= 6, read_cols


def test_tpch_q3_broadcasts_dimension(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tpch_q3_shape")
    assert "BroadcastHashJoin" in plan


def test_hot_relational_paths_have_no_python_eval(spark, sf_dir):
    for name in (
        "agg_group_sums",
        "tpch_q5_shape",
        "join_inner_equi",
        "win_rank_topk",
        "text_wordcount",
        "events_funnel",
        "rollup_hypertable",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_ranked_topk_uses_window_group_limit(spark, sf_dir):
    # Spark 3.5+ rewrites rank<=k filters into WindowGroupLimit, which
    # drops non-top-k rows BEFORE the shuffle — the difference between
    # shuffling 10 rows/group and shuffling everything.
    for name in ("win_rank_topk", "sample_stratified", "agg_top_freq"):
        plan = plan_of(spark, sf_dir, name)
        assert "WindowGroupLimit" in plan, name


def test_rollup_hypertable_single_shuffle(spark, sf_dir):
    # GROUPING SETS must plan as Expand + ONE exchange, not 3 scans+union.
    tree = tree_of(spark, sf_dir, "rollup_hypertable")
    assert "Expand" in tree
    assert tree.count("Exchange") == 1, tree
    assert tree.count("Scan parquet") == 1, tree


def test_sort_limit_is_take_ordered(spark, sf_dir):
    # ORDER BY + LIMIT must not global-sort: TakeOrderedAndProject keeps
    # k rows per partition then merges k*p on the driver-side reduce.
    plan = plan_of(spark, sf_dir, "sort_multi_limit")
    assert "TakeOrderedAndProject" in plan


def test_whole_stage_codegen_covers_agg(spark, sf_dir):
    # Under AQE codegen only materializes in the executed plan, so run
    # the query and then read the final adaptive plan: '*(n)' prefixes
    # mark whole-stage-codegen spans.
    df = queries()["agg_group_sums"](spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final, final[:300]
    assert re.search(r"\*\(\d+\) HashAggregate", final), final[:1500]


def test_ivf_assignment_is_broadcast(spark, sf_dir):
    # Centroid assignment and probe joins must broadcast the small side;
    # a shuffled corpus-vs-centroids join would move 100 TB to move 1 MB.
    for name in ("sim_ann_ivf", "sim_ann_ivf_multiprobe"):
        plan = plan_of(spark, sf_dir, name)
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_salted_join_is_shuffled_not_broadcast(spark, sf_dir):
    # The whole point of salting is spreading the shuffle; if Catalyst
    # broadcasts the REPLICATED build side instead, every replica rides
    # the broadcast and the op regresses ~10x (measured at sf0.1).
    plan = plan_of(spark, sf_dir, "join_skew_salted")
    assert "ShuffledHashJoin" in plan, plan.split("\n\n")[0]
    assert "BroadcastHashJoin" not in plan.split("\n\n")[0]


def test_entity_scaled_frames_have_no_unpartitioned_window(spark, sf_dir):
    """Round-5 VERDICT #1: the five formerly global-window ops must never
    sort an ENTITY-SCALED frame in a single task. Since round 11 the
    two-phase rank sites legitimately plan ONE unpartitioned Window —
    the bucket-offset prefix sum over the ≤|buckets|-row count aggregate
    (commit 885a668) — so the pin is structural: every unpartitioned
    Window node's input subtree must contain a full aggregate (input
    cardinality = grouping-key cardinality), i.e. the collapsed bucket
    frame, never the raw entity rows. The registry-wide sweep in
    test_window_partition_pins applies the same bound to ALL ops; this
    test keeps the original five pinned by name."""
    import json

    from tests.test_window_partition_pins import _unpartitioned_windows

    agg_nodes = {
        "HashAggregateExec",
        "ObjectHashAggregateExec",
        "SortAggregateExec",
    }
    for name in (
        "orders_skyline_2d",
        "orders_abc_class",
        "customer_ltv_deciles",
        "events_power_users_pareto",
        "text_zipf_slope",
    ):
        df = queries()[name](spark, sf_dir)
        raw = json.loads(df._jdf.queryExecution().executedPlan().toJSON())
        for classes in _unpartitioned_windows(raw):
            assert classes & agg_nodes, (
                f"{name}: unpartitioned Window over a NON-aggregated "
                "input — single task would sort an entity-scaled frame"
            )
