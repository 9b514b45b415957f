"""SparkSession factory tuned for this engine.

The reference library has no local engine (queries run remotely in Athena);
here the session *is* the engine, so the scale-relevant knobs live in one
place. Settings marked [scale] are the ones that matter on a real cluster
against ~100 TB; the local values are chosen so the same code paths
(AQE, skew-join, partial agg, broadcast selection) are exercised on
local[32].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "dataengineeringutils_spark") -> SparkSession:
    """Build (or fetch) the tuned session.

    - ANSI SQL mode stays ON (Spark 4 default) so cast/overflow semantics
      match the DuckDB oracle and the reference's "raise on non-conforming
      data" behavior (SURVEY.md §4.3).
    - [scale] AQE + coalesce + skew-join: runtime re-planning is the main
      defense against skewed keys and mis-estimated shuffle sizes at 100 TB.
    - [scale] shuffle partitions sized to cores locally; on a cluster this
      should be ~2-3x total executor cores, or left to AQE's
      ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``.
    - Arrow on: every driver-edge pandas conversion is vectorized.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # keep bucketed scans bucketed: the DisableUnnecessaryBucketedScan
        # rule does not credit bucket-FILE pruning as a benefit, so a
        # point lookup on a bucket column would silently read all buckets
        # (sink_ann_cell_layout's serving path relies on the pruning)
        .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        .config("spark.ui.enabled", "false")
        # per-PID warehouse: managed tables (bucketed sinks etc.) from
        # concurrent processes must not collide on spark-warehouse/
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".scratch",
                f"pid-{os.getpid()}",
                "warehouse",
            ),
        )
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]").config("spark.driver.memory", "90g")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
