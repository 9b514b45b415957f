"""Scan operators (B1-B2): raw parquet scan and metadata-conformed read.

The reference reads tables by downloading S3 objects into pandas and
imposing JSON metadata on the frame ([R] dataengineeringutils/s3.py +
pd_metadata_conformance.py — SURVEY.md §0). Here the scan is a lazy
Catalyst relation: column pruning and predicate pushdown reach the parquet
reader, and conformance is a single projection folded into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dataengineeringutils_spark.meta import TableMeta, conform
from dataengineeringutils_spark.registry import query
from dataengineeringutils_spark.tables import table

# Metadata fixture for `customer` (FIXTURES.md "Reference-style metadata
# fixture"): declares c_nationkey as `long` so the conformance cast is a
# real widening (int32 -> int64), not an identity.
CUSTOMER_META = TableMeta.from_dict(
    {
        "name": "customer",
        "description": "conformance fixture",
        "data_format": "parquet",
        "location": "",
        "columns": [
            {"name": "c_custkey", "type": "long", "description": "pk"},
            {"name": "c_name", "type": "character", "description": ""},
            {"name": "c_nationkey", "type": "long", "description": "fk nation (widened)"},
            {"name": "c_acctbal", "type": "double", "description": ""},
            {"name": "c_mktsegment", "type": "character", "description": ""},
        ],
        "partitions": [],
    }
)


@query("scan_parquet", oracle="SELECT * FROM region")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: full parquet scan."""
    return table(spark, sf_dir, "region")


@query(
    "scan_schema_conform",
    oracle="""
    SELECT c_custkey,
           c_name,
           CAST(c_nationkey AS BIGINT) AS c_nationkey,
           c_acctbal,
           c_mktsegment
    FROM customer
    """,
)
def scan_schema_conform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: metadata-driven read — impose declared order + types (A4+A5)."""
    return conform(table(spark, sf_dir, "customer"), CUSTOMER_META)
