"""Query/oracle registry.

Every declared operator from SURVEY.md §2 registers itself here with a
``(spark, sf_dir) -> DataFrame`` callable and (usually) an equivalent
DuckDB oracle SQL string. ``__spark_entry__.py`` exposes the registry to
the driver; local tests reuse it for self-verification.
"""

from __future__ import annotations

import importlib
import textwrap
from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Modules that register queries on import, in SURVEY §2 order.
_OP_MODULES = [
    "dataengineeringutils_spark.sources.scan",
    "dataengineeringutils_spark.sources.sinks",
    "dataengineeringutils_spark.sources.python_datasource",
    "dataengineeringutils_spark.sources.python_stream_source",
    "dataengineeringutils_spark.operators.project_filter",
    "dataengineeringutils_spark.operators.joins",
    "dataengineeringutils_spark.operators.asof",
    "dataengineeringutils_spark.operators.aggregates",
    "dataengineeringutils_spark.operators.windows",
    "dataengineeringutils_spark.operators.setops",
    "dataengineeringutils_spark.operators.relational_extra",
    "dataengineeringutils_spark.operators.composite",
    "dataengineeringutils_spark.operators.tpch_decorrelate",
    "dataengineeringutils_spark.operators.events_analytics",
    "dataengineeringutils_spark.operators.dataeng",
    "dataengineeringutils_spark.operators.pipeline",
    "dataengineeringutils_spark.operators.profiling",
    "dataengineeringutils_spark.operators.sketches",
    "dataengineeringutils_spark.functions.scalar",
    "dataengineeringutils_spark.operators.dedup",
    "dataengineeringutils_spark.operators.graph",
    "dataengineeringutils_spark.operators.mlprep",
    "dataengineeringutils_spark.operators.similarity",
    "dataengineeringutils_spark.operators.text",
    "dataengineeringutils_spark.operators.multimodal",
    "dataengineeringutils_spark.streaming.windows",
    "dataengineeringutils_spark.udf.udfs",
]

_loaded = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as declared operator ``name``.

    ``oracle`` is the DuckDB-runnable ANSI SQL computing the same result
    over the pre-registered fixture views; omit it only for ops whose
    output is not SQL-expressible (driver then does a rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco


def _load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _OP_MODULES:
        importlib.import_module(mod)
    _loaded = True


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
