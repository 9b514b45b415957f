"""Set operators (B31-B33).

UNION ALL is a zero-shuffle concatenation of children; INTERSECT/EXCEPT
use distinct semantics (one shuffle on the full row). Reference locus:
Athena/Presto SQL passthrough, [R] dataengineeringutils/athena.py
(SURVEY.md §0/§2.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringutils_spark.registry import query
from dataengineeringutils_spark.tables import table


def _cust_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return c.join(n, c.c_nationkey == n.n_nationkey).select(F.col("n_name").alias("nation"))


def _supp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations of well-capitalized suppliers (the acctbal filter keeps the
    EXCEPT result non-empty — every nation has *some* supplier)."""
    s = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000)
    n = table(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey).select(F.col("n_name").alias("nation"))


@query(
    "set_union_all",
    oracle="""
    SELECT nation, side, COUNT(*) AS n
    FROM (
        SELECT n.n_name AS nation, 'customer' AS side
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        UNION ALL
        SELECT n.n_name AS nation, 'supplier' AS side
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_acctbal > 5000
    ) u
    GROUP BY nation, side
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31: tagged UNION ALL of customer-nations and supplier-nations."""
    cn = _cust_nations(spark, sf_dir).withColumn("side", F.lit("customer"))
    sn = _supp_nations(spark, sf_dir).withColumn("side", F.lit("supplier"))
    return cn.unionByName(sn).groupBy("nation", "side").agg(F.count("*").alias("n"))


@query(
    "set_intersect",
    oracle="""
    SELECT n.n_name AS nation
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    INTERSECT
    SELECT n.n_name AS nation
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_acctbal > 5000
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32: nations having both customers and suppliers (distinct)."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@query(
    "set_except",
    oracle="""
    SELECT n.n_name AS nation
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    EXCEPT
    SELECT n.n_name AS nation
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_acctbal > 5000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B33: nations with customers but no suppliers (distinct EXCEPT)."""
    return _cust_nations(spark, sf_dir).subtract(_supp_nations(spark, sf_dir))
