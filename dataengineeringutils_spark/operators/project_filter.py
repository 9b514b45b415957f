"""Projection & filter operators (B5-B6).

In the reference these are Presto-side SELECT/WHERE reached through Athena
SQL strings ([R] dataengineeringutils/athena.py passthrough — SURVEY.md §0).
Here they are Catalyst projections/filters; both push down to the parquet
scan (check `.explain("formatted")`: PushedFilters + pruned ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringutils_spark.exprs import revenue
from dataengineeringutils_spark.registry import query
from dataengineeringutils_spark.tables import table


@query(
    "project_compute",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           l_quantity AS qty,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem
    """,
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: narrow projection + computed columns (raw doubles: per-row IEEE
    arithmetic is bit-identical across engines, no rounding needed)."""
    li = table(spark, sf_dir, "lineitem")
    rev = revenue()
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        rev.alias("revenue"),
        (rev * (F.lit(1.0) + F.col("l_tax"))).alias("charged"),
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 1000 AND 200000
      AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND NOT (o_orderstatus = 'F' AND o_totalprice < 5000)
      AND o_custkey IS NOT NULL
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: compound boolean filter (IN/BETWEEN/LIKE/date/NOT/IS NULL arms).

    All conjuncts are pushdown-eligible; the parquet scan receives them as
    PushedFilters so row groups outside the ranges are skipped at 100 TB.
    """
    o = table(spark, sf_dir, "orders")
    pred = (
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(1000, 200000)
        & (F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"))
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & ~((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 5000))
        & F.col("o_custkey").isNotNull()
    )
    return o.filter(pred).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
