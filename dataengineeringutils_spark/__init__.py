"""dataengineeringutils_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
``moj-analytical-services/dataengineeringutils`` (see SURVEY.md), rebuilt
Spark-first: the reference delegates queries to AWS Athena (Presto) and does
ETL in pandas; here every operator is a Catalyst logical plan over
``pyspark.sql.DataFrame``, designed for 100 TB-scale execution.

Public surface:
- ``session``    — tuned SparkSession builder (AQE, ANSI, UTC).
- ``meta``       — JSON table metadata <-> StructType, conformance (A1-A6).
- ``paths``      — s3/posix path utilities (A7).
- ``io``         — metadata-driven readers/writers (A8-A10, B1-B4).
- ``catalog``    — database/table lifecycle on the Spark catalog (A10).
- ``operators``  — relational operator library (B5-B33, B42-B48).
- ``functions``  — scalar function families (B34-B41).
- ``streaming``  — event-time windows, watermarks, stateful dedup (B49-B53).
- ``udf``        — pandas-UDF / grouped-map / mapInPandas surface (B54-B56).
- ``registry``   — query + oracle registry consumed by ``__spark_entry__``.
"""

__version__ = "0.1.0"

from dataengineeringutils_spark.registry import oracle_sql, queries  # noqa: F401
