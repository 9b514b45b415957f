"""Graph-traversal operators: iterative expansion over tabular edges.

Spark has no recursive CTE; bounded traversals are expressed as
ITERATIVE DataFrame rounds with lineage cuts (the same harness as
``dedup_connected_components``). The key scale trick here is POINTER
DOUBLING: each round jumps every node to its ancestor's ancestor, so a
depth-d hierarchy resolves in ceil(log2 d) shuffle rounds, not d —
at 100 TB the difference between 4 rounds and 40.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringutils_spark.registry import query
from dataengineeringutils_spark.tables import table

DOUBLING_ROUNDS = 4  # resolves hierarchies up to depth 2^4


@query(
    "hierarchy_depth_doubling",
    oracle="""
    WITH RECURSIVE walk(start, cur, d) AS (
        SELECT c_custkey, c_custkey, 0 FROM customer
        UNION ALL
        SELECT start, cur // 10, d + 1 FROM walk WHERE cur > 0
    )
    SELECT CAST(depth AS INT) AS depth, COUNT(*) AS n_nodes
    FROM (
        SELECT start, MAX(CASE WHEN cur = 0 THEN d END) AS depth
        FROM walk GROUP BY start
    )
    GROUP BY 1
    """,
)
def hierarchy_depth_doubling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancestor-chain depth for every node of a parent hierarchy
    (parent(k) = k div 10 over customer keys — a synthetic but fully
    deterministic org-chart/BOM stand-in), resolved by pointer doubling.

    Each node starts pointing at its parent with distance 1; every round
    joins the pointer table WITH ITSELF so a node's pointer jumps to its
    ancestor's ancestor and the distances add. Nodes whose pointer hit
    the root (0) stop moving. After ceil(log2 max_depth) rounds every
    node knows its exact depth — the textbook O(log d) alternative to
    d single-step rounds, with an eager lineage cut per round (without
    it the self-join plan doubles every iteration). The oracle walks the
    same chains with a recursive CTE.
    """
    c = table(spark, sf_dir, "customer")
    f = c.select(
        F.col("c_custkey").alias("node"),
        F.expr("c_custkey div 10").alias("anc"),
        # the root (key 0) is at depth 0; everyone else starts one step up
        F.when(F.col("c_custkey") == 0, F.lit(0)).otherwise(F.lit(1)).alias("d"),
    ).localCheckpoint(eager=True)
    for _ in range(DOUBLING_ROUNDS):
        g = f.select(
            F.col("node").alias("g_node"),
            F.col("anc").alias("g_anc"),
            F.col("d").alias("g_d"),
        )
        f = (
            f.join(g, f.anc == g.g_node, "left")
            .select(
                "node",
                F.when(F.col("anc") == 0, F.lit(0))
                .otherwise(F.coalesce("g_anc", "anc"))
                .alias("anc"),
                F.when(F.col("anc") == 0, F.col("d"))
                .otherwise(F.col("d") + F.coalesce("g_d", F.lit(0)))
                .alias("d"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        f.groupBy(F.col("d").cast("int").alias("depth"))
        .agg(F.count("*").alias("n_nodes"))
    )
