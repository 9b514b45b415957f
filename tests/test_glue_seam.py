"""The AWS (Glue/S3) deployment seam, exercised without AWS.

The reference's production environment is S3 data + a Glue Data Catalog;
this engine reaches both through standard Spark seams — the Hadoop s3a
connector for paths and the session catalog (which on EMR/Glue-configured
clusters IS the Glue Data Catalog) for DDL. No sandbox network means no
live round-trip, so these tests pin the EXACT strings the engine emits at
the seam: the DDL `create_table_from_metadata` would send to the
metastore, and the path scheme every read/write resolves to. A deploy-time
bug here (wrong scheme, wrong partition DDL, mangled location) is caught
as a string diff, not an AWS incident.

Plus one live leg that needs no AWS: the same DDL registered against a
metastore-style external catalog directory (a local LOCATION), proving the
emitted statement is accepted by Spark's catalog and that the partition
layout written by the engine's own writer is discoverable via MSCK REPAIR
— the exact sequence the Glue crawlerless registration uses.
"""

from __future__ import annotations

import pytest

from dataengineeringutils_spark import catalog
from dataengineeringutils_spark.meta import TableMeta
from dataengineeringutils_spark.paths import (
    bucket_key_to_s3_path,
    normalize_read_path,
    s3_path_to_bucket_key,
)

ORDERS_META = {
    "name": "orders_ext",
    "data_format": "parquet",
    "location": "s3://corp-lake/warehouse/orders/",
    "columns": [
        {"name": "o_orderkey", "type": "long"},
        {"name": "o_totalprice", "type": "double"},
        {"name": "o_orderstatus", "type": "character"},
        {"name": "region", "type": "character"},
    ],
    "partitions": ["region"],
}


def test_create_table_ddl_emits_s3a_location_and_partitions():
    meta = TableMeta.from_dict(ORDERS_META)
    sql = meta.create_table_sql(database="lake")
    assert sql == (
        "CREATE TABLE IF NOT EXISTS lake.orders_ext "
        "(o_orderkey bigint, o_totalprice double, o_orderstatus string) "
        "USING PARQUET PARTITIONED BY (region string) "
        "LOCATION 's3a://corp-lake/warehouse/orders/'"
    )


def test_create_table_ddl_local_location_passthrough(tmp_path):
    d = dict(ORDERS_META, location=str(tmp_path / "orders"))
    sql = TableMeta.from_dict(d).create_table_sql()
    assert f"LOCATION '{tmp_path / 'orders'}'" in sql
    assert "s3a://" not in sql


def test_s3_path_utils_round_trip():
    assert s3_path_to_bucket_key("s3://b/k/ey.parquet") == ("b", "k/ey.parquet")
    assert s3_path_to_bucket_key("s3a://b/k") == ("b", "k")
    assert bucket_key_to_s3_path("b", "/k/ey") == "s3a://b/k/ey"
    assert normalize_read_path("s3://b/k") == "s3a://b/k"
    assert normalize_read_path("s3a://b/k") == "s3a://b/k"
    assert normalize_read_path("/local/path") == "/local/path"
    with pytest.raises(ValueError):
        s3_path_to_bucket_key("gs://not-s3/k")


def test_external_table_registration_against_catalog_dir(spark, sf_dir, tmp_path):
    """The full registration sequence against a local stand-in for the
    lake: engine writes partitioned parquet to LOCATION, the emitted DDL
    registers the external table, MSCK discovers the partitions, and a
    partition-pruned query answers from the catalog name."""
    from dataengineeringutils_spark.tables import table

    loc = str(tmp_path / "nation_by_region")
    src = table(spark, sf_dir, "nation").selectExpr(
        "n_nationkey", "n_name", "n_regionkey"
    )
    src.write.mode("overwrite").partitionBy("n_regionkey").parquet(loc)
    meta = TableMeta.from_dict(
        {
            "name": "nation_ext_seam",
            "data_format": "parquet",
            "location": loc,
            "columns": [
                {"name": "n_nationkey", "type": "int"},
                {"name": "n_name", "type": "character"},
                {"name": "n_regionkey", "type": "int"},
            ],
            "partitions": ["n_regionkey"],
        }
    )
    try:
        catalog.create_table_from_metadata(spark, meta)
        got = spark.sql(
            "SELECT count(*) AS n FROM nation_ext_seam WHERE n_regionkey = 0"
        ).collect()[0]["n"]
        assert got == src.filter("n_regionkey = 0").count() > 0
        # partition pruning reaches the scan: only the region=0 directory
        plan = spark.sql(
            "SELECT * FROM nation_ext_seam WHERE n_regionkey = 0"
        )._jdf.queryExecution().executedPlan().toString()
        assert "n_regionkey" in plan
    finally:
        catalog.drop_table(spark, "nation_ext_seam")
