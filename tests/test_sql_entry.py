"""A12/A13: SQL entry point parity (sql.py)."""

from __future__ import annotations

from dataengineeringutils_spark.sql import read_sql, read_sql_pandas


def test_read_sql_resolves_views(spark, sf_dir):
    df = read_sql(
        spark,
        "SELECT r_name, COUNT(*) AS n FROM region GROUP BY r_name",
        sf_dir=sf_dir,
    )
    rows = df.collect()
    assert len(rows) == 5
    assert {r["r_name"] for r in rows} == {"AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"}


def test_read_sql_pandas_arrow_edge(spark, sf_dir):
    pdf = read_sql_pandas(spark, "SELECT COUNT(*) AS n FROM nation", sf_dir=sf_dir)
    assert pdf["n"][0] == 25
