"""Smoke tier (t1): every declared query runs at sf0.001 and returns a
stable schema. The full DuckDB-oracle gate is tools/verify_local.py
(t2, sf0.01) — this tier catches plan regressions fast."""

from __future__ import annotations

import pytest

from dataengineeringutils_spark.registry import oracle_sql, queries

QS = queries()


@pytest.mark.parametrize("name", sorted(QS))
def test_query_runs(spark, sf_dir, name):
    df = QS[name](spark, sf_dir)
    rows = df.limit(5).collect()
    assert df.columns, f"{name}: no columns"
    # rows may legitimately be 0 for some filters at sf0.001; schema must hold
    for r in rows:
        assert len(r) == len(df.columns)


def test_every_oracle_has_query():
    assert set(oracle_sql()) <= set(QS)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
