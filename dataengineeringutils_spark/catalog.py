"""Catalog lifecycle (op A10, plus A3's registration path).

The reference creates/deletes Glue databases and tables from metadata via
boto3 — [R] dataengineeringutils/glue.py (SURVEY.md §0). Here the same
lifecycle runs against the Spark session catalog; on AWS the identical
calls hit the Glue Data Catalog when the cluster is configured with the
Glue Hive-metastore client factory (the standard EMR/Glue setup), so this
module *is* the Glue integration — no boto3 required.

Job submission (A11) is intentionally absent: this engine IS the Spark
job; cluster submission is ``spark-submit`` of a script calling
``entry(spark)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dataengineeringutils_spark.meta import TableMeta


def create_database(spark: SparkSession, name: str, if_not_exists: bool = True) -> None:
    ine = "IF NOT EXISTS " if if_not_exists else ""
    spark.sql(f"CREATE DATABASE {ine}{name}")


def drop_database(spark: SparkSession, name: str, cascade: bool = True) -> None:
    spark.sql(f"DROP DATABASE IF EXISTS {name}{' CASCADE' if cascade else ''}")


def create_table_from_metadata(
    spark: SparkSession, meta: TableMeta, database: str | None = None
) -> None:
    """A3/A10: register an external table from its metadata document
    (the Spark rendering of the reference's Glue ``TableInput``)."""
    spark.sql(meta.create_table_sql(database))
    if meta.partitions:
        fq = f"{database}.{meta.name}" if database else meta.name
        spark.sql(f"MSCK REPAIR TABLE {fq}")


def drop_table(spark: SparkSession, name: str, database: str | None = None) -> None:
    fq = f"{database}.{name}" if database else name
    spark.sql(f"DROP TABLE IF EXISTS {fq}")


def overwrite_table(
    spark: SparkSession, df: DataFrame, name: str, database: str | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """A10 'delete and overwrite' as one atomic saveAsTable."""
    fq = f"{database}.{name}" if database else name
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(fq)


def refresh_partitions(spark: SparkSession, name: str, database: str | None = None) -> None:
    """A10: register on-disk Hive partitions (Glue: batch_create_partition)."""
    fq = f"{database}.{name}" if database else name
    spark.sql(f"MSCK REPAIR TABLE {fq}")
