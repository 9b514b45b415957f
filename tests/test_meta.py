"""Unit tests for the metadata/conformance layer (ops A1-A6) — mirrors the
reference's test strategy (SURVEY.md §5.1: round-trip conformance, type
translation, table definitions from metadata)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from dataengineeringutils_spark.meta import (
    ColumnMeta,
    TableMeta,
    check_conformance,
    conform,
    conformance_report,
    conforms,
    impose_column_order,
    impose_types,
    translate_metadata_type_to_type,
)

META_DICT = {
    "name": "customer",
    "description": "test fixture",
    "data_format": "parquet",
    "location": "sf0.01/customer.parquet",
    "columns": [
        {"name": "c_custkey", "type": "long", "description": "pk"},
        {"name": "c_name", "type": "character", "description": ""},
        {"name": "c_nationkey", "type": "int", "description": "fk nation"},
        {"name": "c_acctbal", "type": "double", "description": ""},
        {"name": "c_mktsegment", "type": "character", "description": ""},
    ],
    "partitions": [],
}


def test_json_roundtrip(tmp_path):
    meta = TableMeta.from_dict(META_DICT)
    p = str(tmp_path / "meta.json")
    meta.to_json(p)
    again = TableMeta.from_json(p)
    assert again.to_dict() == meta.to_dict()
    with open(p) as f:
        assert json.load(f)["name"] == "customer"


@pytest.mark.parametrize(
    ("meta_type", "spark_type"),
    [
        ("character", T.StringType()),
        ("int", T.IntegerType()),
        ("long", T.LongType()),
        ("float", T.FloatType()),
        ("double", T.DoubleType()),
        ("date", T.DateType()),
        ("datetime", T.TimestampType()),
        ("boolean", T.BooleanType()),
        ("decimal(12,2)", T.DecimalType(12, 2)),
        ("array<float>", T.ArrayType(T.FloatType())),
    ],
)
def test_type_translation_spark(meta_type, spark_type):
    assert translate_metadata_type_to_type(meta_type, "spark") == spark_type


def test_type_translation_glue_and_pandas():
    assert translate_metadata_type_to_type("long", "glue") == "bigint"
    assert translate_metadata_type_to_type("datetime", "glue") == "timestamp"
    assert translate_metadata_type_to_type("double", "pandas") == "float64"
    with pytest.raises(ValueError):
        translate_metadata_type_to_type("nope", "spark")
    with pytest.raises(ValueError):
        translate_metadata_type_to_type("int", "nope")


def test_spark_schema_and_ddl():
    meta = TableMeta.from_dict(META_DICT)
    schema = meta.spark_schema()
    assert [f.name for f in schema.fields] == meta.column_names
    assert "c_custkey bigint" in meta.ddl()
    sql = meta.create_table_sql("db1")
    assert sql.startswith("CREATE TABLE IF NOT EXISTS db1.customer")
    assert "USING PARQUET" in sql


def test_create_table_sql_partitioned():
    d = dict(META_DICT)
    d["partitions"] = ["c_mktsegment"]
    sql = TableMeta.from_dict(d).create_table_sql()
    assert "PARTITIONED BY (c_mktsegment string)" in sql
    assert "c_mktsegment string)" in sql


def test_conform_reorders_and_casts(spark):
    meta = TableMeta.from_dict(META_DICT)
    df = spark.createDataFrame(
        [("x", 1, 5, 1.0, "SEG")],
        schema="c_name string, c_custkey int, c_nationkey long, c_acctbal double, c_mktsegment string",
    )
    out = conform(df, meta)
    assert out.columns == meta.column_names
    assert conforms(out, meta)
    check_conformance(out, meta)  # should not raise


def test_impose_order_missing_column_raises(spark):
    meta = TableMeta.from_dict(META_DICT)
    df = spark.createDataFrame([(1,)], schema="c_custkey long")
    with pytest.raises(ValueError, match="missing"):
        impose_column_order(df, meta)


def test_check_conformance_raises_on_mismatch(spark):
    meta = TableMeta.from_dict(META_DICT)
    df = spark.createDataFrame(
        [(1, "x", 5, 1.0, "SEG")],
        schema="c_custkey int, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    assert not conforms(df, meta)
    with pytest.raises(ValueError, match="does not conform"):
        check_conformance(df, meta)


def test_conformance_report_counts_bad_casts(spark):
    meta = TableMeta(
        name="t",
        columns=[ColumnMeta("a", "int"), ColumnMeta("b", "double")],
    )
    df = spark.createDataFrame(
        [("1", "2.5"), ("x", "3.0"), ("3", "y")], schema="a string, b string"
    )
    row = conformance_report(df, meta).collect()[0]
    assert row["a_cast_failures"] == 1
    assert row["b_cast_failures"] == 1


def test_impose_types_lenient_nulls_bad_values(spark):
    meta = TableMeta(name="t", columns=[ColumnMeta("a", "int")])
    df = spark.createDataFrame([("1",), ("x",)], schema="a string")
    out = impose_types(df, meta, strict=False)
    vals = [r["a"] for r in out.collect()]
    assert vals.count(None) == 1 and 1 in vals
