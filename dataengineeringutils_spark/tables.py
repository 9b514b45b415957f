"""Fixture-table access used by every declared query.

Tables and schemas per FIXTURES.md; one parquet file per table under the
scale-factor directory. Reads go through ``spark.read.parquet`` so Catalyst
gets predicate pushdown / column pruning on the scan for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Plan-object cache: spark.read.parquet does driver-side file listing +
# footer schema read EAGERLY per call; a 176-query correctness sweep
# re-plans the same ten fixture scans hundreds of times. DataFrames are
# immutable, so handing back the same object is safe and keeps the plan
# (and its pushdown/pruning) identical. Keyed by applicationId so a
# restarted SparkContext never receives a stale plan.
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}
_TUNED: set[tuple[str, str]] = set()


def _sf_of(sf_dir: str) -> float:
    tail = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        return float(tail)
    except ValueError:
        return -1.0


def _tune_for_scale(spark: SparkSession, sf_dir: str) -> None:
    """Size shuffle width to the DATA, not the cluster default.

    A plain session ships spark.sql.shuffle.partitions=200; at sf<=0.02
    (whole dataset ~10 MB) that is 200 near-empty tasks per exchange and
    dominates wall time. AQE coalesces most of it back, but state stores
    and non-AQE subplans still pay per-partition setup. Local mode only —
    on a real cluster this knob belongs to the deployment, not the
    library.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _TUNED:
        return
    _TUNED.add(key)
    # The engine's timestamp semantics are UTC (SURVEY §4): every
    # timestamp column is an instant, rendered/compared in UTC. A plain
    # consumer session in another zone would silently shift the
    # TimestampNTZ cast below AND every toPandas rendering relative to
    # the oracle, so pin it here rather than trusting session.py ran.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if not spark.sparkContext.master.startswith("local"):
        return
    sf = _sf_of(sf_dir)
    if 0 <= sf <= 0.02:
        spark.conf.set("spark.sql.shuffle.partitions", "8")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy scan).

    ``events.ts`` has shipped in two fixture generations: TIMESTAMP(NANOS)
    (which Spark refuses by default, PARQUET_TYPE_ILLEGAL — read as long via
    the legacy conf and integer-divide to µs, matching DuckDB's ns→µs
    truncation) and plain TIMESTAMP(MICROS)/NTZ. Branch on the type the scan
    actually yields so both eras produce an identical TimestampType column.
    """
    if name not in TABLES:
        raise KeyError(f"unknown fixture table: {name}")
    cache_key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _DF_CACHE.get(cache_key)
    if cached is not None:
        return cached
    _tune_for_scale(spark, sf_dir)
    if name == "events":
        from pyspark.sql.types import LongType, TimestampType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = raw.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif not isinstance(ts_type, TimestampType):
            df = raw.withColumn("ts", F.col("ts").cast("timestamp"))
        else:
            df = raw
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _DF_CACHE[cache_key] = df
    return df


_TS_BOUNDS_CACHE: dict[tuple[str, str], tuple] = {}


def ts_bounds(spark: SparkSession, sf_dir: str) -> tuple:
    """(min, max) of ``events.ts``, memoized per (session, fixture dir).

    Several operators anchor their windows to the event-time frontier
    (``max(ts) - INTERVAL ...``); the fixture is immutable for the life
    of a session, so the bounds are computed once and shared — the
    scan-statistics-reuse a warehouse gets from table stats. Cleared
    automatically on session restart (applicationId key)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _TS_BOUNDS_CACHE:
        row = (
            table(spark, sf_dir, "events")
            .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
            .collect()[0]
        )
        _TS_BOUNDS_CACHE[key] = (row["lo"], row["hi"])
    return _TS_BOUNDS_CACHE[key]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql paths)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


_TABLE_BYTES_CACHE: dict[tuple[str, str], int] = {}


def _table_bytes(sf_dir: str, name: str) -> int:
    """On-disk bytes of one fixture table (file or directory)."""
    import os

    key = (sf_dir, name)
    if key not in _TABLE_BYTES_CACHE:
        path = f"{sf_dir}/{name}.parquet"
        total = 0
        try:
            if os.path.isdir(path):
                for root, _dirs, files in os.walk(path):
                    total += sum(
                        os.path.getsize(os.path.join(root, f)) for f in files
                    )
            else:
                total = os.path.getsize(path)
        except OSError:
            total = 1 << 62  # unknown size: treat as huge, never spread
        _TABLE_BYTES_CACHE[key] = total
    return _TABLE_BYTES_CACHE[key]


def _parse_byte_size(s: str) -> int:
    """Parse a Spark byte-size conf string ('128m', '134217728b')."""
    s = s.strip().lower()
    mult = 1
    for suffix, m in (("b", 1), ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if s.endswith(suffix):
            s = s[: -len(suffix)]
            mult = m
            break
    try:
        return int(float(s) * mult)
    except ValueError:
        return 128 << 20


def spread_small_scan(
    spark: SparkSession, sf_dir: str, name: str, df: DataFrame, *keys: str
) -> DataFrame:
    """Keyed spread of a fixture scan ONLY when the table is small
    enough that Spark would plan it as a single scan task.

    The sf0.1 fixture files are single-row-group parquet (lineitem:
    10.8 MB, one row group), so the scan is ONE task and every per-row
    expression — most painfully the exact DECIMAL products feeding
    heavily-reducing aggregates — serializes on one core. A keyed
    repartition parallelizes that math, but an UNCONDITIONAL one is a
    scale regression: at 100 TB it is a full extra exchange of the
    fact table before a partial aggregate that would otherwise move
    ~|groups| x |tasks| rows (round-11 VERDICT item 1).

    Gate: spread only while the table's on-disk bytes fit inside ONE
    scan split (``spark.sql.files.maxPartitionBytes``; a single row
    group cannot be split further anyway). Then the exchange moves at
    most one task's worth of input — cheap, and strictly better than
    serializing. Past one split the scan parallelizes by itself and
    this helper is the identity, so the declared plan at scale has NO
    exchange before the partial aggregate. Override for tests/plans
    via ``SPARK_GRAFT_SPREAD_MAX_BYTES`` (``0`` disables the spread).
    """
    import os

    env = os.environ.get("SPARK_GRAFT_SPREAD_MAX_BYTES")
    if env is not None:
        limit = int(env)
    else:
        limit = _parse_byte_size(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
        )
    if _table_bytes(sf_dir, name) > limit:
        return df
    return df.repartition(spark.sparkContext.defaultParallelism, *keys)
