"""Custom Python DataSource (Spark 4 DataSource API): the connector seam.

The reference's connector layer wraps bespoke readers behind a uniform
table interface ([R] dataengineeringutils/s3.py, glue.py — SURVEY.md
§0/§2.A7-A10); Spark 4's Python DataSource API is the native way to add
such a reader: implement ``DataSource``/``DataSourceReader``, register
once, and every consumer gets it through the ordinary
``spark.read.format(...)`` path — schema declaration, partition planning
and parallel execution included.

Scale notes: ``partitions()`` is the parallelism contract — each
``InputPartition`` becomes one Spark task, so a production source (an
API, a DB shard set, a message queue) maps its natural sharding onto
partitions and the cluster fans out one task per shard. The demo source
generates a deterministic integer sequence split into equal ranges; rows
are produced directly on executors (nothing is collected on the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from dataengineeringutils_spark.registry import query


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class NumbersReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.num_parts = int(options.get("parts", 8))

    def partitions(self):
        step = max(1, -(-self.n // self.num_parts))
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for v in range(partition.start, partition.end):
            yield (v, v * v, v % 10)


class NumbersDataSource(DataSource):
    """Deterministic synthetic integer source, ``format("numbers_synth")``."""

    @classmethod
    def name(cls) -> str:
        return "numbers_synth"

    def schema(self) -> str:
        return "id BIGINT, sq BIGINT, bucket INT"

    def reader(self, schema) -> NumbersReader:
        return NumbersReader(self.options)


@query(
    "scan_python_datasource",
    oracle="""
    SELECT CAST(i % 10 AS INT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(i) AS BIGINT) AS sum_id,
           CAST(SUM(i * i) AS BIGINT) AS sum_sq
    FROM range(0, 10000) t(i)
    GROUP BY 1
    """,
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read from the registered custom Python data source and aggregate.

    The source plans 8 ``InputPartition`` ranges -> 8 parallel tasks, each
    generating its slice executor-side; the aggregate on top is ordinary
    Catalyst (partial agg before the shuffle). The oracle regenerates the
    same sequence with DuckDB's ``range()``, checking the source's rows
    are exactly the declared deterministic function of its options.
    """
    from pyspark.sql import functions as F

    spark.dataSource.register(NumbersDataSource)
    df = (
        spark.read.format("numbers_synth")
        .option("n", "10000")
        .option("parts", "8")
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.sum("id").alias("sum_id"),
        F.sum("sq").alias("sum_sq"),
    )


# Reader/partition classes ship to executors; serialize this module by
# value so workers need not import the package (see serde.py).
from dataengineeringutils_spark.serde import pickle_module_by_value  # noqa: E402

pickle_module_by_value(__name__)
