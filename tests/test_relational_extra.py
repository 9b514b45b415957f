"""Semantic assertions for the extended relational surface
(operators/relational_extra.py) and the IVF ANN op, beyond the smoke tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineeringutils_spark.registry import queries

QS = queries()


def test_gapfill_dense_axis(spark, sf_dir):
    rows = QS["timeseries_gapfill"](spark, sf_dir).orderBy("day").collect()
    assert len(rows) == 59  # Feb 1995 (28) + Mar 1995 (31)
    days = [r["day"] for r in rows]
    assert all((b - a).days == 1 for a, b in zip(days, days[1:]))
    assert all(r["n_orders"] >= 0 for r in rows)


def test_percentiles_ordered(spark, sf_dir):
    for r in QS["agg_percentiles"](spark, sf_dir).collect():
        assert r["p25"] <= r["p50"] <= r["p75"]
        assert r["med"] == r["p50"]


def test_pivot_row_sums_match_totals(spark, sf_dir):
    df = QS["pivot_wide"](spark, sf_dir)
    pivot_total = df.select(
        (
            F.col("urgent")
            + F.col("high")
            + F.col("medium")
            + F.col("not_specified")
            + F.col("low")
        ).alias("t")
    ).agg(F.sum("t")).collect()[0][0]
    from dataengineeringutils_spark.tables import table

    assert pivot_total == table(spark, sf_dir, "orders").count()


def test_unpivot_doubles_rows(spark, sf_dir):
    from dataengineeringutils_spark.tables import table

    n_parts = (
        table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500).count()
    )
    df = QS["unpivot_long"](spark, sf_dir)
    assert df.count() == 2 * n_parts
    attrs = {r["attr"] for r in df.select("attr").distinct().collect()}
    assert attrs == {"size", "retailprice"}


def test_rolling_frame_bounds(spark, sf_dir):
    rows = QS["win_rolling_stats"](spark, sf_dir).collect()
    assert all(1 <= r["roll_n"] <= 7 for r in rows)


def test_ivf_topk_shape(spark, sf_dir):
    rows = QS["sim_ann_ivf"](spark, sf_dir).collect()
    per_q: dict[int, int] = {}
    for r in rows:
        assert r["q_id"] < 20 and r["vec_id"] != r["q_id"]
        assert -1.0001 <= r["cos_sim"] <= 1.0001
        per_q[r["q_id"]] = per_q.get(r["q_id"], 0) + 1
    assert per_q and max(per_q.values()) <= 3
