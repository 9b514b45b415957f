"""Metadata-driven I/O + folder utilities (ops A8-A9, and the write side
of A3/B3-B4).

The reference moves bytes with boto3 (upload/download/copy/delete S3
objects, gzip'd CSV/JSONL) — [R] dataengineeringutils/s3.py (SURVEY.md §0).
Spark-first, tabular data never passes through the client: readers/writers
stream directly between executors and storage, and folder operations go
through the Hadoop FileSystem API, which works identically for ``file://``
in tests and ``s3a://`` on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dataengineeringutils_spark.meta import TableMeta, conform
from dataengineeringutils_spark.paths import normalize_read_path

_FORMATS = {"csv", "json", "parquet"}


def read_table(spark: SparkSession, meta: TableMeta, path: str | None = None) -> DataFrame:
    """Read a table as described by its metadata document: declared format,
    declared schema (never inferSchema — inference is a full extra pass at
    100 TB and type-unstable), conformance imposed."""
    fmt = meta.data_format
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported data_format: {fmt}")
    src = normalize_read_path(path or meta.location)
    reader = spark.read.schema(meta.spark_schema())
    if fmt == "csv":
        df = reader.option("header", True).csv(src)
    elif fmt == "json":
        df = reader.json(src)
    else:
        df = spark.read.parquet(src)  # parquet carries its own schema
    return conform(df, meta)


def write_table(
    df: DataFrame,
    meta: TableMeta,
    path: str | None = None,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write a frame per its metadata: conform first (the reference raises
    on non-conforming frames; ANSI cast does the same), then write in the
    declared format, Hive-partitioned by the declared partition columns."""
    out = normalize_read_path(path or meta.location)
    conformed = conform(df, meta)
    writer = conformed.write.mode(mode)
    if meta.partitions:
        writer = writer.partitionBy(*meta.partitions)
    if compression:
        writer = writer.option("compression", compression)
    fmt = meta.data_format
    if fmt == "csv":
        writer.option("header", True).csv(out)
    elif fmt == "json":
        writer.json(out)
    elif fmt == "parquet":
        writer.parquet(out)
    else:
        raise ValueError(f"unsupported data_format: {fmt}")


# --- A9: folder operations via the Hadoop FileSystem API -------------------


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf), jpath, jvm


def get_filepaths_from_folder(spark: SparkSession, folder: str) -> list[str]:
    """A9: list file paths under a folder (local or s3a), recursively."""
    fs, jpath, jvm = _fs(spark, normalize_read_path(folder))
    if not fs.exists(jpath):
        return []
    out = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        out.append(it.next().getPath().toString())
    return sorted(out)


def check_for_file(spark: SparkSession, path: str) -> bool:
    """A9: does the object/file exist?"""
    fs, jpath, _ = _fs(spark, normalize_read_path(path))
    return bool(fs.exists(jpath))


def delete_folder_contents(spark: SparkSession, folder: str) -> None:
    """A9: remove everything under a folder (the folder itself remains)."""
    fs, jpath, jvm = _fs(spark, normalize_read_path(folder))
    if not fs.exists(jpath):
        return
    for status in fs.listStatus(jpath):
        fs.delete(status.getPath(), True)


def copy_folder_contents(spark: SparkSession, src: str, dst: str) -> None:
    """A9: server-side copy of a folder's files to a new folder."""
    fs, jsrc, jvm = _fs(spark, normalize_read_path(src))
    jdst = jvm.org.apache.hadoop.fs.Path(normalize_read_path(dst))
    fs.mkdirs(jdst)
    util = jvm.org.apache.hadoop.fs.FileUtil
    hconf = spark._jsc.hadoopConfiguration()
    for status in fs.listStatus(jsrc):
        util.copy(fs, status.getPath(), fs, jdst, False, True, hconf)
