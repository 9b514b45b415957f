"""SQL entry points — A12/A13 parity.

The reference submits SQL strings to AWS Athena and polls for completion,
then pulls the CSV result into pandas ([R] dataengineeringutils/athena.py:
get_athena_query_response / read_sql — SURVEY.md §3.1). Here Catalyst IS
the engine: ``read_sql`` resolves the same ANSI SQL against registered
fixture views and returns a lazy, distributed DataFrame; ``read_sql_pandas``
is the pandas-materializing variant (Arrow transfer), for the edges where
the reference's callers genuinely want a local frame. There is no polling
loop and no result-file round-trip — the ~1 s/query latency floor the
reference inherits from Athena's poll cycle simply does not exist.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from dataengineeringutils_spark.tables import register_views


def read_sql(spark: SparkSession, sql: str, sf_dir: str | None = None) -> DataFrame:
    """A12/A13: run ANSI SQL, distributed result. When ``sf_dir`` is given,
    the fixture tables are (re-)registered as temp views first."""
    if sf_dir is not None:
        register_views(spark, sf_dir)
    return spark.sql(sql)


def read_sql_pandas(spark: SparkSession, sql: str, sf_dir: str | None = None) -> pd.DataFrame:
    """A13 edge: materialize to pandas via Arrow (only at the driver edge —
    never inside an operator)."""
    return read_sql(spark, sql, sf_dir).toPandas()
