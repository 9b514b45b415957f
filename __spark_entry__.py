"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine's operator registry (dataengineeringutils_spark):
- ``entry(spark)``  — flagship query (TPC-H Q1 shape) at sf0.001.
- ``queries()``     — every declared operator from SURVEY.md §2.
- ``oracle_sql()``  — DuckDB oracles for the hash-checkable subset.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dataengineeringutils_spark import queries as _queries

    return _queries()["agg_group_sums"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dataengineeringutils_spark import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per hash-checkable query (rows-only ops
    — approximate/stateful — are intentionally absent)."""
    from dataengineeringutils_spark import oracle_sql as _oracle_sql

    return _oracle_sql()
