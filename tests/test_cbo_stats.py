"""Cost-based-optimizer and partition-pruning behavior, driven end-to-end.

These pin the two optimizer behaviors that only show up when the engine is
wired to real table metadata (not just in-memory frames):

- ANALYZE TABLE statistics flow into join planning: a table that LOOKS
  large by file size but is small after stats gets broadcast once stats
  exist (the CBO path the reference delegated to Athena/Presto).
- Partition-pruned reads: a partitionBy-written dataset filtered on the
  partition column must show PartitionFilters and touch only matching
  directories — at 100 TB this is reading 1/N of the lake instead of N/N.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from dataengineeringutils_spark.paths import scratch_dir
from dataengineeringutils_spark.tables import table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_analyze_stats_enable_broadcast(spark, sf_dir):
    # DROP TABLE clears the (session-local) metastore entry, but the
    # managed-table directory in spark-warehouse/ survives across
    # sessions and blocks the next saveAsTable — remove both.
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("cbo_orders", "cbo_custkeys"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    table(spark, sf_dir, "orders").write.mode("overwrite").saveAsTable("cbo_orders")
    # A projected one-column table: small, but Spark only knows that
    # from stats (file-size estimates are conservative upper bounds).
    table(spark, sf_dir, "customer").select("c_custkey").limit(500).write.mode(
        "overwrite"
    ).saveAsTable("cbo_custkeys")

    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE cbo_custkeys COMPUTE STATISTICS")

    j = spark.table("cbo_orders").join(
        spark.table("cbo_custkeys"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    plan = _plan(j)
    assert "BroadcastHashJoin" in plan, plan.split("\n\n")[0]

    row = spark.sql("DESC EXTENDED cbo_custkeys").filter(
        F.col("col_name") == "Statistics"
    ).collect()
    assert row and "rows" in row[0]["data_type"], row


def test_partition_pruning_on_partitioned_write(spark, sf_dir):
    out = scratch_dir("pruning_orders")
    o = table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    o.write.mode("overwrite").partitionBy("o_year").parquet(out)

    df = spark.read.parquet(out).filter(F.col("o_year") == 1995)
    plan = _plan(df)
    assert "PartitionFilters: [" in plan
    # The pruned read must constrain o_year inside PartitionFilters.
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "o_year" in pf, plan
    # And the data filter list must NOT need o_year (it never hits rows).
    assert df.count() == o.filter(F.col("o_year") == 1995).count()


def test_dynamic_partition_pruning_subquery_in_plan(spark, sf_dir):
    """A join between a year-partitioned fact and a filtered dim on the
    partition column must plan a DPP filter: the fact scan's partition
    list is decided at RUNTIME from the dim side (at 100 TB: touching
    only the partitions the dim selects, without a literal year filter).
    """
    out = scratch_dir("dpp_orders")
    o = table(spark, sf_dir, "orders").withColumn("o_year", F.year("o_orderdate"))
    o.write.mode("overwrite").partitionBy("o_year").parquet(out)

    fact = spark.read.parquet(out)
    # The dim predicate must be NON-foldable onto the join key: filtering
    # the dim on the key itself ("d_year = 1995") gets constant-propagated
    # into a STATIC partition filter (verified — Catalyst infers
    # o_year = 1995 transitively and DPP never fires). Deriving the year
    # set from an unrelated predicate leaves it runtime-only.
    dim = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .filter(F.year("o_orderdate") >= 1996)
        .select(F.year("o_orderdate").alias("d_year"))
        .distinct()
    )
    j = fact.join(dim, fact.o_year == dim.d_year).groupBy("o_year").count()
    plan = _plan(j)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    rows = j.collect()
    assert rows and all(r["o_year"] >= 1996 for r in rows)
