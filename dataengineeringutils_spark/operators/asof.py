"""As-of (most-recent-at-or-before) join — B16.

Spark SQL has no batch ASOF JOIN (DuckDB does; pandas-on-Spark has
``merge_asof`` but materializes per-group pandas frames). This module
implements it with pure built-ins via the union+window technique:

1. Tag left rows (probes) and right rows (quotes) and union them.
2. Sort within each key partition by (event time, side) — right rows first
   on ties, giving inclusive `left.ts >= right.ts` semantics.
3. A running ``last(payload, ignorenulls=True)`` window carries the most
   recent right payload forward onto every left row.

Scale: one shuffle on the key + one sort — identical cost profile to a
sort-merge join, no per-group materialization, spillable, AQE-coalescible.
Skewed keys can be salted upstream; the window frame is running (no full
partition buffering).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineeringutils_spark.registry import query
from dataengineeringutils_spark.tables import table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the payload of the
    right row with the greatest ``right_ts <= left_ts`` within ``by``.

    Ties (equal timestamps) match, consistent with DuckDB ``ASOF JOIN``'s
    ``>=`` condition. Left rows with no earlier right row get NULL payload.
    """
    pay_struct: Column = F.struct(*[F.col(c) for c in payload])
    l_tag = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1)).withColumn(
        "__pay", F.lit(None).cast(right.select(pay_struct.alias("p")).schema["p"].dataType)
    )
    r_tag = (
        right.select(
            F.col(by),
            F.col(right_ts).alias("__ts"),
            F.lit(0).alias("__side"),
            pay_struct.alias("__pay"),
        )
    )
    # align columns: right rows carry NULL for left-only columns
    left_cols = [c for c in left.columns]
    r_full = r_tag.select(
        *[
            F.col(c) if c in (by,) else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left_cols
        ],
        "__ts",
        "__side",
        "__pay",
    )
    unioned = l_tag.select(*left_cols, "__ts", "__side", "__pay").unionByName(r_full)

    w = (
        Window.partitionBy(by)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__carry", F.last("__pay", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        *left_cols,
        *[F.col("__carry").getField(c).alias(f"{payload_prefix}{c}") for c in payload],
    )
    return out


@query(
    "join_asof",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           c.ts AS asof_click_ts,
           c.value AS asof_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16: for each purchase event, the most recent click (ts and value)
    by the same user at or before the purchase time."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts"), F.col("ts").alias("click_ts"), F.col("value").alias("click_value"))
    )
    joined = asof_join(
        purchases,
        clicks,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["click_ts", "click_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_click_ts"),
        F.col("asof_click_value"),
    )
