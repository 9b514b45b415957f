"""Unit tests for metadata-driven I/O (A8-A9) and catalog lifecycle (A10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineeringutils_spark import catalog, io
from dataengineeringutils_spark.meta import TableMeta
from dataengineeringutils_spark.tables import table

NATION_META = {
    "name": "nation_copy",
    "data_format": "csv",
    "location": "",
    "columns": [
        {"name": "n_nationkey", "type": "int"},
        {"name": "n_name", "type": "character"},
        {"name": "n_regionkey", "type": "int"},
    ],
    "partitions": [],
}


def test_write_read_roundtrip_csv(spark, sf_dir, tmp_path):
    meta = TableMeta.from_dict(NATION_META)
    out = str(tmp_path / "nation_csv")
    src = table(spark, sf_dir, "nation")
    io.write_table(src, meta, path=out)
    back = io.read_table(spark, meta, path=out)
    assert back.schema == meta.spark_schema()
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in src.collect()
    )


def test_write_partitioned_parquet(spark, sf_dir, tmp_path):
    meta = TableMeta.from_dict(
        {
            "name": "nation_part",
            "data_format": "parquet",
            "columns": NATION_META["columns"],
            "partitions": ["n_regionkey"],
        }
    )
    out = str(tmp_path / "nation_part")
    io.write_table(table(spark, sf_dir, "nation"), meta, path=out)
    files = io.get_filepaths_from_folder(spark, out)
    assert any("n_regionkey=0" in f for f in files)
    one = spark.read.parquet(out).filter(F.col("n_regionkey") == 0)
    assert one.count() == 5


def test_folder_ops(spark, tmp_path):
    d = str(tmp_path / "folder")
    meta = TableMeta.from_dict(NATION_META)
    src = spark.createDataFrame([(1, "X", 0)], schema="n_nationkey int, n_name string, n_regionkey int")
    io.write_table(src, meta, path=d)
    assert io.check_for_file(spark, d)
    files = io.get_filepaths_from_folder(spark, d)
    assert files
    d2 = str(tmp_path / "folder2")
    io.copy_folder_contents(spark, d, d2)
    assert io.get_filepaths_from_folder(spark, d2)
    io.delete_folder_contents(spark, d)
    assert io.get_filepaths_from_folder(spark, d) == []
    assert io.get_filepaths_from_folder(spark, str(tmp_path / "missing")) == []


def test_catalog_lifecycle(spark, sf_dir, tmp_path):
    catalog.create_database(spark, "testdb")
    try:
        df = table(spark, sf_dir, "region")
        catalog.overwrite_table(spark, df, "region_t", database="testdb")
        assert spark.table("testdb.region_t").count() == 5
        # overwrite again (delete-and-overwrite path)
        catalog.overwrite_table(spark, df.limit(3), "region_t", database="testdb")
        assert spark.table("testdb.region_t").count() == 3
        catalog.drop_table(spark, "region_t", database="testdb")
        assert "region_t" not in [t.name for t in spark.catalog.listTables("testdb")]
    finally:
        catalog.drop_database(spark, "testdb")


def test_create_external_table_from_metadata(spark, sf_dir):
    meta = TableMeta.from_dict(
        {
            "name": "region_ext",
            "data_format": "parquet",
            "location": f"{sf_dir}/region.parquet",
            "columns": [
                {"name": "r_regionkey", "type": "int"},
                {"name": "r_name", "type": "character"},
            ],
            "partitions": [],
        }
    )
    catalog.drop_table(spark, "region_ext")
    catalog.create_table_from_metadata(spark, meta)
    try:
        assert spark.sql("SELECT COUNT(*) AS n FROM region_ext").collect()[0]["n"] == 5
    finally:
        catalog.drop_table(spark, "region_ext")


def test_observe_metrics_ride_the_action(spark, sf_dir):
    """df.observe: pipeline instrumentation without a second scan.

    The conformance/audit pattern at 100 TB: row counts and quality
    tallies are collected AS the job runs (accumulator-style, exact for
    counts/sums) instead of re-aggregating the input. The observation
    must not change the result."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from dataengineeringutils_spark.tables import table

    obs = Observation("ingest_audit")
    o = table(spark, sf_dir, "orders")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("bad_price"),
    )
    out = observed.filter(F.col("o_orderpriority") == "1-URGENT").count()
    metrics = obs.get
    assert metrics["n_rows"] == o.count()  # observed BEFORE the filter
    assert metrics["bad_price"] == 0
    assert out == o.filter(F.col("o_orderpriority") == "1-URGENT").count()
