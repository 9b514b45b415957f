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
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)

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
        # One Arrow RecordBatch per range instead of a row-at-a-time
        # tuple generator (guide §4.1: batches cross the Python->JVM
        # boundary as Arrow; tuples are pickled row by row). Values are
        # identical — int64/int64/int32 match the declared schema.
        import numpy as np
        import pyarrow as pa

        ids = np.arange(partition.start, partition.end, dtype=np.int64)
        yield pa.record_batch(
            [
                pa.array(ids, type=pa.int64()),
                pa.array(ids * ids, type=pa.int64()),
                pa.array((ids % 10).astype(np.int32), type=pa.int32()),
            ],
            names=["id", "sq", "bucket"],
        )


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


# --- custom WRITER: the outbound half of the connector seam ---------------


class _WrittenFile(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class JsonlDirWriter(DataSourceArrowWriter):
    """Task-side writer: each task streams its partition to a uniquely
    named segment file and reports it in a commit message; the DRIVER
    finalizes the write by publishing a ``_MANIFEST`` listing exactly
    the committed segments (readers trust the manifest, not the
    directory listing — half-written files from dead tasks are
    invisible). ``abort`` removes any segments already written. This is
    the object-store commit protocol in miniature: uniquely-named
    immutable segments + an atomic manifest publish.

    Arrow variant (guide §4.1): ``DataSourceArrowWriter.write`` receives
    whole Arrow record batches instead of pickled Rows, so the
    JVM->Python boundary moves columns once per batch; the JSON text per
    row is unchanged (``json.dumps`` over the same Python values), so
    the written segments are byte-identical modulo row grouping."""

    def __init__(self, options, overwrite: bool = True):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        fname = os.path.join(self.path, f"seg-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname + ".inprogress", "w") as f:
            for batch in iterator:
                for rec in batch.to_pylist():
                    f.write(json.dumps(rec) + "\n")
                    n += 1
        os.rename(fname + ".inprogress", fname)
        return _WrittenFile(fname, n)

    def commit(self, messages):
        import os

        manifest = os.path.join(self.path, "_MANIFEST")
        lines = []
        # mode("append") must UNION the new segments with the published
        # manifest — a wholesale rewrite silently dropped every
        # previously committed segment from the list readers trust
        # (ADVICE r4). Overwrite keeps replace semantics; stale segment
        # files from the replaced manifest are unreferenced, not read.
        if not self.overwrite and os.path.exists(manifest):
            with open(manifest) as f:
                lines = [ln for ln in f.read().splitlines() if ln]
        for m in messages:
            if m is None:
                continue
            lines.append(f"{m.path}\t{m.n_rows}")
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            f.write("".join(ln + "\n" for ln in lines))
        os.replace(tmp, manifest)

    def abort(self, messages):
        import os

        # Spark passes None for tasks that never completed; reading
        # m.path off those raised AttributeError and masked the original
        # job failure (ADVICE r4).
        for m in messages:
            if m is None:
                continue
            try:
                os.unlink(m.path)
            except FileNotFoundError:
                pass


class JsonlDirDataSource(DataSource):
    """JSONL segment-directory sink, ``format("jsonl_dir")``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema, overwrite: bool):
        return JsonlDirWriter(self.options, overwrite)


@query(
    "sink_python_datasource_writer",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderkey % 4 = 0
    GROUP BY o_orderstatus
    """,
)
def sink_python_datasource_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write THROUGH a custom Python DataSource writer (Spark 4
    DataSource API, outbound direction — the reader half is
    ``scan_python_datasource``): each task streams its partition to a
    uniquely named JSONL segment, the driver publishes an atomic
    ``_MANIFEST`` of committed segments, and the read-back trusts the
    manifest only — the object-store commit protocol (uniquely-named
    immutable segments + manifest publish) that makes bespoke sinks
    exactly-once under task retries. The oracle recomputes the
    aggregate from the source table, so a lost segment, a double-
    committed retry, or value mangling in serialization all break the
    hash.
    """
    import os
    import uuid

    from dataengineeringutils_spark.paths import scratch_dir
    from dataengineeringutils_spark.tables import table

    spark.dataSource.register(JsonlDirDataSource)
    out = scratch_dir("pyds_writer_" + uuid.uuid4().hex)
    src = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 4 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    src.repartition(4).write.format("jsonl_dir").mode("append").option(
        "path", out
    ).save()
    with open(os.path.join(out, "_MANIFEST")) as f:
        files = [line.split("\t")[0] for line in f.read().splitlines()]
    back = spark.read.schema(
        "o_orderkey bigint, o_orderstatus string, o_totalprice double"
    ).json(files)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )
