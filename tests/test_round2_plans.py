"""Physical-plan contracts for the round-2 operators.

Same discipline as test_new_ops_plans.py: pin the property that makes
each op scale — broadcast direction, shuffle count, Python-crossing
placement — not just that it runs.
"""

from __future__ import annotations

import contextlib
import io

from dataengineeringutils_spark.registry import queries


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _tree(df) -> str:
    return _plan(df).split("\n\n")[0]


def test_feature_scale_stats_broadcast_no_fact_window(spark, sf_dir):
    tree = _tree(queries()["ml_feature_scale"](spark, sf_dir))
    # group stats must come back via broadcast join; a Window here would
    # mean the fact table was shuffled per group
    assert "BroadcastHashJoin" in tree, tree
    assert "Window" not in tree


def test_one_hot_is_pure_codegen(spark, sf_dir):
    tree = _tree(queries()["ml_one_hot_encode"](spark, sf_dir))
    assert "Exchange" not in tree, tree
    assert "Join" not in tree


def test_chunk_spans_no_shuffle(spark, sf_dir):
    tree = _tree(queries()["text_chunk_spans"](spark, sf_dir))
    assert "Exchange" not in tree, tree
    assert "Generate" in tree  # the explode


def test_balance_classes_fact_never_shuffled(spark, sf_dir):
    tree = _tree(queries()["dataset_balance_classes"](spark, sf_dir))
    assert "BroadcastHashJoin" in tree, tree
    assert "SortMergeJoin" not in tree


def test_top_terms_prunes_with_window_group_limit(spark, sf_dir):
    tree = _tree(queries()["text_top_terms_per_lang"](spark, sf_dir))
    assert "WindowGroupLimit" in tree, tree


def test_dim_stats_single_shuffle(spark, sf_dir):
    tree = _tree(queries()["embeddings_dim_stats"](spark, sf_dir))
    assert tree.count("Exchange") == 1, tree


def test_ecdf_single_scan_counter_form(spark, sf_dir):
    tree = _tree(queries()["events_value_ecdf"](spark, sf_dir))
    # one pass over events with conditional counters — NOT the oracle's
    # 10x probe cross join
    assert tree.count("Scan parquet") == 1, tree
    assert "Join" not in tree


def test_yoy_growth_windows_the_yearly_frame_only(spark, sf_dir):
    tree = _tree(queries()["orders_yoy_growth"](spark, sf_dir))
    # aggregate first, then lag over the |years|-row frame: in the
    # top-down formatted tree the Window must sit ABOVE (print before)
    # the aggregates, consuming their output — and there is one scan
    assert "Window" in tree
    assert tree.index("Window") < tree.index("HashAggregate"), tree
    assert tree.count("Scan parquet") == 1, tree


def test_pagerank_top10_is_take_ordered(spark, sf_dir):
    tree = _tree(queries()["graph_pagerank"](spark, sf_dir))
    assert "TakeOrderedAndProject" in tree, tree


def test_phash_payload_never_shuffles(spark, sf_dir):
    plan = _plan(queries()["multimodal_phash_dedup"](spark, sf_dir))
    tree = plan.split("\n\n")[0]
    # the Python crossing sits before the only exchange: fingerprints
    # shuffle, payloads do not
    assert "MapInPandas" in tree, tree
    # count_distinct(fp) plans the standard two-phase distinct aggregate
    # (2 exchanges of 8-byte keys); the Python crossing must sit BELOW
    # both — in the top-down formatted tree, deeper = later index
    assert tree.count("Exchange") == 2, tree
    assert tree.index("MapInPandas") > tree.rindex("Exchange"), tree


def test_skew_kurtosis_single_aggregate(spark, sf_dir):
    tree = _tree(queries()["agg_skew_kurtosis"](spark, sf_dir))
    assert tree.count("Exchange") == 1, tree
    assert "Join" not in tree


def test_bitwise_agg_single_shuffle(spark, sf_dir):
    tree = _tree(queries()["agg_bitwise"](spark, sf_dir))
    assert tree.count("Exchange") == 1, tree


def test_ann_cell_layout_bucket_pruning_fires(spark, sf_dir):
    plan = _plan(queries()["sink_ann_cell_layout"](spark, sf_dir))
    # each query's cell scan must read ONLY its bucket: 1 of 8
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:2000]
