"""Python UDF surface (B54-B56) — the engine's escape hatch, Arrow-batched.

Patterns follow the public grouped-map/pandas-udf idioms (SNIPPETS.md [1]
and [3]): vectorized scalar ``pandas_udf``, per-group ``applyInPandas``,
and 1->N ``mapInPandas`` expansion. Row-at-a-time Python UDFs are banned
in this engine: every Python crossing is an Arrow batch.

Scale: pandas UDFs stream Arrow batches per partition (no driver
involvement); ``applyInPandas`` shuffles by the group key and materializes
one group per call — group sizes must be bounded (documented per-op).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from dataengineeringutils_spark.registry import query
from dataengineeringutils_spark.tables import table


def _discounted_price_kernel(price: pd.Series, discount: pd.Series) -> pd.Series:
    """Vectorized scalar kernel: price * (1 - discount) on Arrow batches.
    Same IEEE ops as the SQL expression -> bit-identical to the oracle."""
    return price * (1.0 - discount)


@query(
    "udf_scalar",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           l_extendedprice * (1 - l_discount) AS discounted
    FROM lineitem
    WHERE l_orderkey <= 400
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B54: vectorized scalar pandas UDF (Arrow batch transfer)."""
    discounted_price = pandas_udf(_discounted_price_kernel, "double")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 400)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        discounted_price("l_extendedprice", "l_discount").alias("discounted"),
    )


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: z-score of `value` within one user's events.
    (Pattern per SNIPPETS.md [1] convert_to_pandas_udf / [3] gapply.)"""
    mean = pdf["value"].mean()
    std = pdf["value"].std(ddof=1)
    z = (pdf["value"] - mean) / std if std and std > 0 else pdf["value"] * 0.0
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "zscore": z.round(4),
        }
    )


@query(
    "udaf_grouped_map",
    oracle="""
    SELECT event_id,
           user_id,
           ROUND((value - AVG(value) OVER (PARTITION BY user_id))
                 / STDDEV_SAMP(value) OVER (PARTITION BY user_id), 4) AS zscore
    FROM events
    WHERE user_id < 5
    """,
)
def udaf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B55: per-user z-score via grouped-map applyInPandas.

    One user's events fit one pandas frame (bounded group size); results
    rounded to 4 dp because mean/stddev summation order differs between
    pandas and the oracle's window aggregate.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    return ev.groupBy("user_id").applyInPandas(
        _zscore_group, schema="event_id long, user_id long, zscore double"
    )


def _explode_tokens(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: 1->N row expansion (doc -> one row per token,
    with 1-based position). The Python-side equivalent of a UDTF."""
    for pdf in it:
        rows = {"doc_id": [], "pos": [], "token": []}
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            toks = [t for t in text.split(" ") if t]
            rows["doc_id"].extend([doc_id] * len(toks))
            rows["pos"].extend(range(1, len(toks) + 1))
            rows["token"].extend(toks)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "pos": pd.Series(rows["pos"], dtype="int32"),
                "token": pd.Series(rows["token"], dtype="object"),
            }
        )


@query(
    "udtf_flatmap",
    oracle="""
    SELECT doc_id,
           CAST(pos AS INT) AS pos,
           tok AS token
    FROM (
        SELECT doc_id,
               generate_subscripts(toks, 1) AS pos,
               UNNEST(toks) AS tok
        FROM (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks
            FROM documents
            WHERE doc_id < 20
        )
    )
    """,
)
def udtf_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B56: 1->N row expansion via mapInPandas (UDTF shape)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select("doc_id", "text").mapInPandas(
        _explode_tokens, schema="doc_id long, pos int, token string"
    )


# Kernels above ship to executors; serialize this module by value so the
# driver does not need the package importable on workers (see serde.py).
from dataengineeringutils_spark.serde import pickle_module_by_value  # noqa: E402

pickle_module_by_value(__name__)


@query(
    "udtf_python_native",
    oracle="""
    SELECT doc_id, tok AS word, length(tok) AS wlen
    FROM (
        SELECT doc_id,
               UNNEST(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        FROM documents
        WHERE doc_id < 50
    )
    """,
)
def udtf_python_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 native Python UDTF (``@udtf`` class, LATERAL-applied):
    1->N tokenization with a per-row Python generator.

    Contrast with ``udtf_flatmap``: the class-based UDTF is the
    user-facing API (registerable, callable from SQL, supports
    ``analyze()`` for polymorphic schemas) but crosses Python per ROW;
    ``mapInPandas`` crosses per Arrow BATCH and stays the hot-path
    choice. Both appear here deliberately so the trade-off is measured,
    not assumed (see bench.py output for the gap).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, wlen: int")
    class Tokens:
        def eval(self, text: str):
            for t in (text or "").split(" "):
                if t:
                    yield t, len(t)

    spark.udtf.register("tokens_udtf", Tokens)
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.word, t.wlen
        FROM _udtf_docs d, LATERAL tokens_udtf(d.text) t
        """
    )


@query(
    "udf_arrow_quantize",
    oracle="""
    WITH dims AS (
        SELECT vec_id, u.i AS i, CAST(embedding[u.i] AS DOUBLE) AS x
        FROM embeddings,
             LATERAL UNNEST(range(1, len(embedding) + 1)) AS u(i)
        WHERE vec_id < 500
    ),
    rng AS (
        SELECT vec_id, MIN(x) AS mn, MAX(x) AS mx
        FROM dims GROUP BY vec_id
    ),
    q AS (
        SELECT d.vec_id,
               FLOOR((d.x - r.mn) / (r.mx - r.mn) * 127 + 0.5) AS qv,
               d.x, r.mn, r.mx
        FROM dims d JOIN rng r ON d.vec_id = r.vec_id
    )
    SELECT vec_id,
           CAST(SUM(qv) AS BIGINT) AS sum_q,
           ROUND(AVG(POW(x - (mn + qv * (mx - mn) / 127), 2)) * 1e6, 4)
               AS mse_ppm
    FROM q
    GROUP BY vec_id
    """,
)
def udf_arrow_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization via ``mapInArrow`` — the lowest-overhead
    Python crossing (raw Arrow RecordBatches, no pandas conversion).

    The storage-shrink stage of an embedding pipeline: per-vector min/max
    affine quantization to [0, 127] plus reconstruction error, computed by
    a numpy kernel over whole Arrow batches. ``mapInArrow`` completes the
    engine's Python-exchange spectrum (scalar pandas_udf -> mapInPandas ->
    applyInPandas -> Arrow-native) and is the choice when the kernel wants
    raw buffers without pandas box/unbox overhead. Rounding uses
    floor(v + 0.5) on BOTH sides — numpy's round() is banker's, SQL ROUND
    is half-up; writing the tie-break explicitly is the only portable
    form. Error is reported in ppm (×1e6) so the 4-dp round sits well
    above double noise.
    """
    import numpy as np
    import pyarrow as pa

    def kernel(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            vec_ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            emb = np.asarray(
                batch.column("embedding").to_pylist(), dtype=np.float64
            )
            mn = emb.min(axis=1, keepdims=True)
            mx = emb.max(axis=1, keepdims=True)
            scale = (mx - mn) / 127.0
            q = np.floor((emb - mn) / (mx - mn) * 127.0 + 0.5)
            dq = mn + q * scale
            mse_ppm = np.round(((emb - dq) ** 2).mean(axis=1) * 1e6, 4)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(vec_ids, type=pa.int64()),
                    pa.array(q.sum(axis=1).astype(np.int64)),
                    pa.array(mse_ppm, type=pa.float64()),
                ],
                names=["vec_id", "sum_q", "mse_ppm"],
            )

    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    return e.select("vec_id", "embedding").mapInArrow(
        kernel, "vec_id long, sum_q long, mse_ppm double"
    )


def _median_kernel(v: pd.Series) -> float:
    """GROUPED_AGG kernel: exact order-statistic median via numpy
    selection — no float accumulation, so the result is the identical
    double the oracle's PERCENTILE_CONT(0.5) returns (odd counts pick
    one element; even counts average the same two doubles)."""
    import numpy as np

    return float(np.median(v.to_numpy(dtype="float64")))


def _count_kernel(v: pd.Series) -> int:
    return int(len(v))


@query(
    "udaf_pandas_grouped_agg",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice)
               AS median_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def udaf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the fourth Python-exchange mode (scalar
    pandas_udf / applyInPandas / mapInPandas being the others): a
    vectorized aggregate whose kernel sees each group's column as one
    numpy array. Plans as an Aggregate with an AggregateInPandas
    exchange: partials DON'T combine map-side (the kernel isn't
    decomposable), so at 100 TB this mode is for aggregates that
    genuinely need the whole group (exact medians, model fits) — and
    the group-by key must be high-cardinality enough to spread.
    """
    from dataengineeringutils_spark.tables import table as _t

    med = pandas_udf(_median_kernel, "double")
    cnt = pandas_udf(_count_kernel, "long")
    o = _t(spark, sf_dir, "orders")
    # Spark disallows mixing GROUPED_AGG pandas UDFs with JVM aggregates
    # in one Aggregate (INVALID_PANDAS_UDF_PLACEMENT) — both aggregates
    # here are pandas kernels sharing one exchange.
    return (
        o.groupBy("o_orderpriority")
        .agg(
            cnt("o_totalprice").alias("n"),
            med("o_totalprice").alias("median_price"),
        )
        .orderBy("o_orderpriority")
    )


def _digit_sum_kernel(key: pd.Series) -> pd.Series:
    """Vectorized digit sum of a non-negative integer key — exact integer
    arithmetic, so the SQL-side oracle reproduces it digit for digit."""
    s = key.astype("int64")
    out = s * 0
    while (s > 0).any():
        out = out + s % 10
        s = s // 10
    return out


@query(
    "udf_sql_registered",
    oracle="""
    SELECT o_orderkey,
           CAST(list_sum(list_transform(
               string_split(CAST(o_orderkey AS VARCHAR), ''),
               c -> CAST(c AS BIGINT))) AS BIGINT) AS key_digit_sum,
           COUNT(*) OVER (PARTITION BY 1) AS n_rows
    FROM orders
    WHERE o_orderkey <= 500
    """,
)
def udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-surface UDF path: a pandas (Arrow-vectorized) kernel
    registered with ``spark.udf.register`` and invoked FROM SQL TEXT —
    how notebook/BI users consume custom functions, vs the DataFrame
    ``withColumn`` path the other udf ops exercise. The kernel is exact
    integer arithmetic so the oracle recomputes it from digits.
    """
    from pyspark.sql.functions import pandas_udf

    spark.udf.register(
        "key_digit_sum", pandas_udf(_digit_sum_kernel, "bigint")
    )
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderkey,
               key_digit_sum(o_orderkey) AS key_digit_sum,
               COUNT(*) OVER () AS n_rows
        FROM orders_v
        WHERE o_orderkey <= 500
        """
    )


@query(
    "udtf_table_argument",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents
    GROUP BY lang
    """,
)
def udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF consuming a TABLE ARGUMENT with ``PARTITION BY lang
    ORDER BY doc_id`` (Spark 4 table-function seam): each language's
    rows stream through one UDTF instance in order, the instance
    accumulates procedurally, and ``terminate()`` emits the per-group
    summary — the shape for per-group logic a grouped aggregate can't
    express (protocol parsers, legacy per-group state machines) while
    Spark still handles partitioning, ordering and parallelism.
    First/last doc ids prove the ORDER BY reached the instance; the
    oracle recomputes everything relationally, so a partition split or
    order violation breaks the hash.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "lang string, n_docs bigint, total_chars bigint, "
        "first_doc bigint, last_doc bigint"
    ))
    class LangSummary:
        def __init__(self):
            self.lang = None
            self.n = 0
            self.chars = 0
            self.first = None
            self.last = None

        def eval(self, row):
            self.lang = row["lang"]
            self.n += 1
            self.chars += row["n_chars"]
            if self.first is None:
                self.first = row["doc_id"]
            self.last = row["doc_id"]

        def terminate(self):
            if self.lang is not None:
                yield (self.lang, self.n, self.chars, self.first, self.last)

    spark.udtf.register("deu_lang_summary", LangSummary)
    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    view = f"docs_udtf_{abs(hash(sf_dir)) % 10**8}"
    d.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT * FROM deu_lang_summary("
        f"TABLE({view}) PARTITION BY lang ORDER BY doc_id)"
    )


@query(
    "udtf_analyze_polymorphic",
    oracle="""
    WITH src AS (
        SELECT n_nationkey, n_name, n_regionkey FROM nation
    ),
    unpivoted AS (
        SELECT 'n_nationkey' AS col_name,
               CAST(n_nationkey AS VARCHAR) AS val FROM src
        UNION ALL
        SELECT 'n_name', n_name FROM src
        UNION ALL
        SELECT 'n_regionkey', CAST(n_regionkey AS VARCHAR) FROM src
    )
    SELECT col_name,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
           MIN(val) AS min_val
    FROM unpivoted GROUP BY col_name
    """,
)
def udtf_analyze_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): the output
    schema is computed at PLAN time from the argument's type — this
    generic row-unpivoter emits (col_name, val) pairs for WHATEVER
    struct it is handed, no per-table registration, the mechanism
    behind reusable profiling/explode utilities. The per-column
    profile it feeds (counts, distincts, lexicographic min as strings)
    is pinned by a hand-unpivoted oracle over the same three columns.

    The UDTF crosses to Python once per row with a 3-field struct —
    acceptable for a dimension profile; fact-scale unpivoting stays in
    ``unpivot_long`` (pure stack(), no Python).
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class UnpivotRow:
        @staticmethod
        def analyze(row: AnalyzeArgument) -> AnalyzeResult:
            # schema derived from the ARGUMENT type at plan time
            return AnalyzeResult(
                StructType().add("col_name", "string").add("val", "string")
            )

        def eval(self, row):
            for name in row.__fields__:
                v = row[name]
                yield (name, None if v is None else str(v))

    spark.udtf.register("deu_unpivot_row", udtf(UnpivotRow))
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    view = f"nation_poly_{abs(hash(sf_dir)) % 10**8}"
    n.createOrReplaceTempView(view)
    pairs = spark.sql(
        f"SELECT f.* FROM {view} t, LATERAL deu_unpivot_row("
        f"struct(t.n_nationkey, t.n_name, t.n_regionkey)) f"
    )
    return pairs.groupBy("col_name").agg(
        F.count("*").cast("bigint").alias("n_values"),
        F.countDistinct("val").cast("bigint").alias("n_distinct"),
        F.min("val").alias("min_val"),
    )
