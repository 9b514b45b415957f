"""Fixture-table access used by every declared query.

Tables and schemas per FIXTURES.md; one parquet file per table under the
scale-factor directory. Reads go through ``spark.read.parquet`` so Catalyst
gets predicate pushdown / column pruning on the scan for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy scan).

    ``events.ts`` has shipped in two fixture generations: TIMESTAMP(NANOS)
    (which Spark refuses by default, PARQUET_TYPE_ILLEGAL — read as long via
    the legacy conf and integer-divide to µs, matching DuckDB's ns→µs
    truncation) and plain TIMESTAMP(MICROS)/NTZ. Branch on the type the scan
    actually yields so both eras produce an identical TimestampType column.
    """
    if name not in TABLES:
        raise KeyError(f"unknown fixture table: {name}")
    if name == "events":
        from pyspark.sql.types import LongType, TimestampType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = raw.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if not isinstance(ts_type, TimestampType):
            return raw.withColumn("ts", F.col("ts").cast("timestamp"))
        return raw
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql paths)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
