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


@query(
    "set_union_drift",
    oracle="""
    WITH a AS (
        SELECT doc_id, lang, n_chars, CAST(NULL AS VARCHAR) AS source
        FROM documents WHERE doc_id % 2 = 0
    ),
    b AS (
        SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars, source
        FROM documents WHERE doc_id % 2 = 1
    )
    SELECT lang,
           COUNT(*) AS n_rows,
           COUNT(n_chars) AS with_chars,
           COUNT(source) AS with_source,
           SUM(COALESCE(n_chars, 0)) AS sum_chars
    FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
    GROUP BY lang
    """,
)
def set_union_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift union: two frames with DIFFERENT column sets combined
    by NAME with null fill — ``unionByName(allowMissingColumns=True)``.

    The real-world union: two ingestion eras of the same table where a
    column was added/retired. Positional UNION would silently misalign
    or reject; by-name union aligns on column identity and fills the
    missing side with NULLs (observable downstream via COUNT(col) /
    null-skipping aggregates — asserted per language here). Still a
    zero-shuffle concatenation: alignment is a per-child projection.
    """
    d = table(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang", "n_chars")
    b = d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "source")
    u = a.unionByName(b, allowMissingColumns=True)
    return u.groupBy("lang").agg(
        F.count("*").alias("n_rows"),
        F.count("n_chars").alias("with_chars"),
        F.count("source").alias("with_source"),
        F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).alias("sum_chars"),
    )
