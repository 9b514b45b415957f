"""Differential fuzz for the STREAMING surface (round-7 VERDICT #4: the
one family with no differential shape).

Each seed generates a windowed-aggregation case — tumbling, sliding, or
session — over the events fixture, with seeded parameters (window /
slide / gap width, watermark delay, key and type filters, aggregate
set, micro-batch count, out-of-order tail displacement) and runs it
THREE ways:

1. **stream**: a real Structured Streaming job (file source, one parquet
   file per micro-batch, ``maxFilesPerTrigger=1``, availableNow, append
   mode, memory sink) through the same ``run_streaming`` harness the
   registered streaming ops use;
2. **batch**: the identical aggregation as a plain DataFrame plan plus
   the append-mode EMISSION predicate (window/session end <= final
   watermark = max event time - delay) — the pinned Spark 4 contract
   from ``stream_watermark_late`` / ``stream_session_append``;
3. **oracle**: DuckDB SQL — epoch-aligned window arithmetic
   (``make_timestamp``/``epoch_us``; no ``time_bucket``, whose origin is
   not epoch for widths that do not divide a day) or the
   gaps-and-islands CTE for sessions, with the same emission predicate.

All three must agree exactly. Late-data safety is BY CONSTRUCTION, not
luck: batches are contiguous time slices, and the displaced tail rows
move exactly one batch LATER — Spark's filtering watermark for batch N
derives from data through batch N-2, whose maximum event time is
strictly below any displaced row's (contiguity), so no generated row can
ever be dropped and arrival order provably cannot change the answer.
What the fuzz therefore checks: window/session assignment, epoch
alignment, exact-decimal accumulation across state-store merges, the
emission boundary (<=, not <), and state carry-over across micro-batch
seams — per seed, against two independent implementations.

Window widths are whole minutes; boundary ties between minute-aligned
window ends and the µs-grain watermark are unobservable on the jittered
fixture timestamps (same caveat as the registered session op).
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringutils_spark.exprs import money_sum, o_money_sum
from dataengineeringutils_spark.fuzzgen import compare_frames
from dataengineeringutils_spark.streaming.windows import run_streaming
from dataengineeringutils_spark.tables import table

EVENT_TYPES = ("click", "view", "purchase", "share", "login")

# whole-minute widths that divide a day — keeps every window boundary
# minute-aligned and the w/s-windows-per-event enumeration exact
_WIDTHS = (5, 8, 10, 15, 20, 30, 45, 60, 90, 120, 180, 240)


def gen_stream_case(seed: int) -> dict:
    """One seeded streaming case. Same seed -> identical case forever."""
    rng = random.Random(10_000_000 + seed)
    shape = rng.choice(["tumbling", "sliding", "session"])
    case: dict = {"shape": shape, "seed": seed}
    case["types"] = (
        sorted(rng.sample(EVENT_TYPES, k=rng.randint(1, 3)))
        if rng.random() < 0.5
        else None
    )
    if rng.random() < 0.4:
        m = rng.randint(2, 7)
        case["user_mod"] = (m, rng.randrange(m))
    else:
        case["user_mod"] = None
    case["delay_min"] = rng.choice([10, 30, 60, 120, 240])
    case["with_sum"] = rng.random() < 0.7
    case["with_max"] = rng.random() < 0.4
    if shape == "session":
        case["gap_min"] = rng.choice([15, 30, 60, 120, 240])
        case["n_batches"] = rng.randint(1, 3)
    else:
        w = rng.choice(_WIDTHS)
        case["w_min"] = w
        if shape == "sliding":
            divs = [s for s in _WIDTHS if s < w and w % s == 0]
            case["s_min"] = rng.choice(divs) if divs else w
            if case["s_min"] == w:
                case["shape"] = shape = "tumbling"
        case["by_type"] = rng.random() < 0.6
        case["n_batches"] = rng.randint(1, 5)
    case["displace"] = rng.randint(0, 3)  # tail rows pushed one batch later
    return case


def _src_pandas(spark: SparkSession, sf_dir: str, case: dict) -> pd.DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "ts", "event_type", F.col("user_id").cast("long").alias("user_id"),
        "value", F.col("event_id").cast("long").alias("event_id"),
    )
    if case["types"] is not None:
        ev = ev.filter(F.col("event_type").isin(*case["types"]))
    if case["user_mod"] is not None:
        m, r = case["user_mod"]
        ev = ev.filter(F.col("user_id") % m == r)
    pdf = ev.toPandas()
    return pdf.sort_values(["ts", "event_id"], kind="mergesort").reset_index(
        drop=True
    )


def _batches(spark: SparkSession, pdf: pd.DataFrame, case: dict) -> list:
    """Contiguous time slices; the last ``displace`` rows of each slice
    (except the final one) arrive one micro-batch later — provably never
    late (see module docstring)."""
    schema = "ts timestamp, event_type string, user_id long, value double"
    n = case["n_batches"]
    cuts = [round(i * len(pdf) / n) for i in range(n + 1)]
    chunks = [pdf.iloc[cuts[i]: cuts[i + 1]] for i in range(n)]
    d = case["displace"]
    if d and n > 1:
        moved: list[pd.DataFrame] = []
        out = []
        for i, ch in enumerate(chunks):
            parts = moved
            moved = []
            if i < n - 1 and len(ch) > d:
                parts = [*parts, ch.iloc[:-d]]
                moved = [ch.iloc[-d:]]
            else:
                parts = [*parts, ch]
            out.append(pd.concat(parts) if len(parts) > 1 else parts[0])
        if moved:  # displaced tail of the last processed chunk
            out[-1] = pd.concat([out[-1], *moved])
        chunks = out
    cols = ["ts", "event_type", "user_id", "value"]
    return [
        spark.createDataFrame(ch[cols], schema=schema)
        for ch in chunks
        if len(ch)
    ]


def _where_sql(case: dict) -> str:
    conds = []
    if case["types"] is not None:
        quoted = ", ".join(f"'{t}'" for t in case["types"])
        conds.append(f"event_type IN ({quoted})")
    if case["user_mod"] is not None:
        m, r = case["user_mod"]
        conds.append(f"user_id % {m} = {r}")
    return (" WHERE " + " AND ".join(conds)) if conds else ""


def _measures(case: dict) -> tuple[list, list[str]]:
    cols = [F.count("*").cast("bigint").alias("n_events")]
    sqls = ["CAST(COUNT(*) AS BIGINT) AS n_events"]
    if case["with_sum"]:
        cols.append(money_sum("value").alias("sum_value"))
        sqls.append(f"{o_money_sum('value')} AS sum_value")
    if case["with_max"]:
        cols.append(F.max("value").alias("max_value"))
        sqls.append("MAX(value) AS max_value")
    return cols, sqls


def to_stream_sql(case: dict, max_ts: pd.Timestamp) -> str:
    """DuckDB oracle for the case (emission predicate included)."""
    wm = f"TIMESTAMP '{max_ts}' - INTERVAL {case['delay_min']} MINUTE"
    _, msql = _measures(case)
    if case["shape"] == "session":
        g = case["gap_min"]
        return f"""
        WITH src AS (
            SELECT user_id, ts, value FROM events{_where_sql(case)}
        ),
        gaps AS (
            SELECT user_id, ts, value,
                   CASE WHEN LAG(ts) OVER w IS NULL
                        OR ts - LAG(ts) OVER w > INTERVAL {g} MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM src
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        islands AS (
            SELECT *, SUM(new_session) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS sid
            FROM gaps
        )
        SELECT user_id AS k_user,
               MIN(ts) AS k_start,
               MAX(ts) AS session_last,
               {', '.join(msql)}
        FROM islands
        GROUP BY user_id, sid
        HAVING MAX(ts) + INTERVAL {g} MINUTE <= {wm}
        """
    w_us = case["w_min"] * 60_000_000
    s_us = (
        case["s_min"] if case["shape"] == "sliding" else case["w_min"]
    ) * 60_000_000
    nk = w_us // s_us
    key = ", event_type" if case["by_type"] else ""
    k_type = ", event_type AS k_type" if case["by_type"] else ""
    return f"""
    WITH src AS (
        SELECT ts, event_type, value,
               (epoch_us(ts) // {s_us}) * {s_us} AS top_us
        FROM events{_where_sql(case)}
    ),
    exploded AS (
        SELECT make_timestamp(top_us - k * {s_us}) AS ws, event_type, value
        FROM src CROSS JOIN (SELECT UNNEST(range({nk})) AS k) ks
    )
    SELECT ws AS k_ws{k_type}, {', '.join(msql)}
    FROM exploded
    GROUP BY ws{key}
    HAVING ws + INTERVAL {case['w_min']} MINUTE <= {wm}
    """


def _spark_agg(case: dict, src: DataFrame, max_ts) -> DataFrame:
    """The aggregation + emission predicate, shared by the batch plan
    and (sans predicate, which streaming enforces via the watermark) the
    streaming build."""
    cols, _ = _measures(case)
    wm = F.lit(max_ts) - F.expr(f"INTERVAL {case['delay_min']} MINUTES")
    if case["shape"] == "session":
        g = case["gap_min"]
        agg = src.groupBy(
            F.session_window("ts", f"{g} minutes"), "user_id"
        ).agg(F.min("ts").alias("k_start"), F.max("ts").alias("session_last"), *cols)
        return agg.filter(
            F.col("session_last") + F.expr(f"INTERVAL {g} MINUTES") <= wm
        ).select(
            F.col("user_id").alias("k_user"),
            "k_start",
            "session_last",
            *[c for c in agg.columns if c.startswith(("n_", "sum_", "max_"))],
        )
    win = (
        F.window("ts", f"{case['w_min']} minutes", f"{case['s_min']} minutes")
        if case["shape"] == "sliding"
        else F.window("ts", f"{case['w_min']} minutes")
    )
    keys = [win] + (["event_type"] if case["by_type"] else [])
    agg = src.groupBy(*keys).agg(*cols)
    out_keys = [F.col("window.start").alias("k_ws")] + (
        [F.col("event_type").alias("k_type")] if case["by_type"] else []
    )
    return agg.filter(F.col("window.end") <= wm).select(
        *out_keys,
        *[c for c in agg.columns if c.startswith(("n_", "sum_", "max_"))],
    )


def _stream_build(case: dict):
    cols, _ = _measures(case)
    delay = f"{case['delay_min']} minutes"

    def build(stream: DataFrame) -> DataFrame:
        s = stream.withWatermark("ts", delay)
        if case["shape"] == "session":
            g = case["gap_min"]
            agg = s.groupBy(
                F.session_window("ts", f"{g} minutes"), "user_id"
            ).agg(
                F.min("ts").alias("k_start"),
                F.max("ts").alias("session_last"),
                *cols,
            )
            return agg.select(
                F.col("user_id").alias("k_user"),
                "k_start",
                "session_last",
                *[
                    c
                    for c in agg.columns
                    if c.startswith(("n_", "sum_", "max_"))
                ],
            )
        win = (
            F.window(
                "ts", f"{case['w_min']} minutes", f"{case['s_min']} minutes"
            )
            if case["shape"] == "sliding"
            else F.window("ts", f"{case['w_min']} minutes")
        )
        keys = [win] + (["event_type"] if case["by_type"] else [])
        agg = s.groupBy(*keys).agg(*cols)
        out_keys = [F.col("window.start").alias("k_ws")] + (
            [F.col("event_type").alias("k_type")] if case["by_type"] else []
        )
        return agg.select(
            *out_keys,
            *[c for c in agg.columns if c.startswith(("n_", "sum_", "max_"))],
        )

    return build


# ---------------------------------------------------------------------------
# Stateful-join / dedup-state shape families (round-8 VERDICT #3): the
# state-store paths where an off-by-one in eviction silently drops rows.
#
# SOUNDNESS (why stream == batch by construction, so any divergence is a
# real engine bug, not fuzz noise):
#
# ssjoin — watermarked interval join, ONE-SIDED lookback bound
# (right.ts in [left.ts - B, left.ts]). Batches are contiguous time
# slices; Spark's global watermark for batch N derives from data through
# N-2 (pinned contract). For any pair (a, b): if b arrived first, when
# a's batch processes W <= max_ts(two batches back) - D <= ta - D, and
# right-side eviction needs W > tb + B >= ta, impossible since D > 0;
# if a arrived first, left-side eviction needs W > ta >= tb >= W + D.
# So NO matchable partner is ever evicted early — for ANY delay D > 0,
# displacement included — while genuinely old state still evicts during
# the run (the path under test). The one-sided bound is what makes the
# displaced case airtight; a symmetric bound would need D >= slice span.
#
# dedup_wm — dropDuplicatesWithinWatermark over the full row INCLUDING
# event_id (round-9 ADVICE: with event_id kept, natural (ts,type,user,
# value) coincidences in the fixture are unique by construction, so the
# argument below needs NO assumption about fixture content). Duplicates
# are COPIES of the last ``dup_tail`` rows of each slice — event_id and
# all — injected one batch later: when the copy arrives in batch i+1,
# W <= end(slice i-1) - D <= original.ts, so the original's state entry
# survives and the copy is dropped; the copy itself is never
# watermark-filtered for the same reason displaced rows never are.
# Stream output therefore equals batch dropDuplicates equals DISTINCT
# over the (filtered) source.
# ---------------------------------------------------------------------------

# actual fixture event types (EVENT_TYPES above keeps the original
# aggregate families' seed mapping stable)
_FIXTURE_TYPES = ("click", "error", "purchase", "signup", "view")


def gen_stateful_case(seed: int) -> dict:
    """One seeded stateful case (stream-stream join or dedup-state).
    Same seed -> identical case forever; separate seed space from
    gen_stream_case so the aggregate families' cases never shift."""
    rng = random.Random(20_000_000 + seed)
    shape = rng.choice(["ssjoin", "dedup_wm"])
    case: dict = {"shape": shape, "seed": seed}
    if rng.random() < 0.4:
        m = rng.randint(2, 5)
        case["user_mod"] = (m, rng.randrange(m))
    else:
        case["user_mod"] = None
    case["delay_min"] = rng.choice([10, 30, 60, 120])
    case["n_batches"] = rng.randint(2, 5)
    if shape == "ssjoin":
        case["bound_min"] = rng.choice([15, 30, 60, 120])
        case["l_types"] = sorted(rng.sample(_FIXTURE_TYPES, k=rng.randint(1, 2)))
        case["r_types"] = sorted(rng.sample(_FIXTURE_TYPES, k=rng.randint(1, 2)))
        case["displace"] = rng.randint(0, 3)
    else:
        case["types"] = (
            sorted(rng.sample(_FIXTURE_TYPES, k=rng.randint(1, 3)))
            if rng.random() < 0.5
            else None
        )
        case["dup_tail"] = rng.randint(1, 3)
    return case


def _stateful_src_pandas(
    spark: SparkSession, sf_dir: str, case: dict
) -> pd.DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "ts",
        "event_type",
        F.col("user_id").cast("long").alias("user_id"),
        "value",
        F.col("event_id").cast("long").alias("event_id"),
    )
    if case["shape"] == "ssjoin":
        all_types = sorted(set(case["l_types"]) | set(case["r_types"]))
        ev = ev.filter(F.col("event_type").isin(*all_types))
    elif case.get("types") is not None:
        ev = ev.filter(F.col("event_type").isin(*case["types"]))
    if case["user_mod"] is not None:
        m, r = case["user_mod"]
        ev = ev.filter(F.col("user_id") % m == r)
    pdf = ev.toPandas()
    return pdf.sort_values(["ts", "event_id"], kind="mergesort").reset_index(
        drop=True
    )


def _slices(pdf: pd.DataFrame, n: int) -> list[pd.DataFrame]:
    cuts = [round(i * len(pdf) / n) for i in range(n + 1)]
    return [pdf.iloc[cuts[i]: cuts[i + 1]] for i in range(n)]


def _mod_sql(case: dict) -> str:
    if case["user_mod"] is None:
        return ""
    m, r = case["user_mod"]
    return f" AND user_id % {m} = {r}"


def _run_ssjoin(spark: SparkSession, con, sf_dir: str, case: dict) -> list:
    """Stream-stream inner interval join three ways; returns issues."""
    from dataengineeringutils_spark.paths import ram_scratch_dir, scratch_dir
    from dataengineeringutils_spark.streaming.windows import _sink_counter

    pdf = _stateful_src_pandas(spark, sf_dir, case)
    if not len(pdf):
        return []
    chunks = _slices(pdf, case["n_batches"])
    d = case["displace"]
    if d and len(chunks) > 1:
        moved: list[pd.DataFrame] = []
        out = []
        for i, ch in enumerate(chunks):
            parts = moved
            moved = []
            if i < len(chunks) - 1 and len(ch) > d:
                parts = [*parts, ch.iloc[:-d]]
                moved = [ch.iloc[-d:]]
            else:
                parts = [*parts, ch]
            out.append(pd.concat(parts) if len(parts) > 1 else parts[0])
        if moved:
            out[-1] = pd.concat([out[-1], *moved])
        chunks = out
    schema = "ts timestamp, event_type string, user_id long, value double, event_id long"
    cols = ["ts", "event_type", "user_id", "value", "event_id"]
    base = scratch_dir(f"sfz_ssj_{case['seed']}")
    n_l = n_r = 0
    for i, ch in enumerate(chunks):
        lch = ch[ch["event_type"].isin(case["l_types"])]
        rch = ch[ch["event_type"].isin(case["r_types"])]
        if len(lch):
            spark.createDataFrame(lch[cols], schema=schema).coalesce(
                1
            ).write.mode("overwrite").parquet(f"{base}/l/b={i}")
            n_l += 1
        if len(rch):
            spark.createDataFrame(rch[cols], schema=schema).coalesce(
                1
            ).write.mode("overwrite").parquet(f"{base}/r/b={i}")
            n_r += 1
    if not n_l or not n_r:
        return []
    delay = f"{case['delay_min']} minutes"
    bound = case["bound_min"]
    left = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(f"{base}/l/b=*")
        .withWatermark("ts", delay)
        .select(
            F.col("event_id").alias("k_lid"),
            F.col("ts").alias("l_ts"),
            "user_id",
        )
    )
    right = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(f"{base}/r/b=*")
        .withWatermark("ts", delay)
        .select(
            F.col("event_id").alias("k_rid"),
            F.col("ts").alias("r_ts"),
            F.col("user_id").alias("r_user"),
        )
    )
    cond = (
        (F.col("user_id") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {bound} MINUTES"))
        & (F.col("r_ts") <= F.col("l_ts"))
    )
    joined = left.join(right, cond).select(
        "k_lid", "k_rid", F.col("user_id").alias("k_user")
    )
    name = f"sfz_sink_{next(_sink_counter)}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled"
    )
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    # INNER join: rows emit in the data batch that matched them; the
    # trailing no-data batch only evicts state a terminating run never
    # reads again (same rationale as the registered stream_stream_join)
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ram_scratch_dir(f"ck_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
        )
    stream_pdf = spark.table(name).toPandas()

    # batch plan: identical join over the union of the side batches
    lb = spark.read.schema(schema).parquet(f"{base}/l/b=*")
    rb = spark.read.schema(schema).parquet(f"{base}/r/b=*")
    batch_pdf = (
        lb.select(
            F.col("event_id").alias("k_lid"), F.col("ts").alias("l_ts"), "user_id"
        )
        .join(
            rb.select(
                F.col("event_id").alias("k_rid"),
                F.col("ts").alias("r_ts"),
                F.col("user_id").alias("r_user"),
            ),
            cond,
        )
        .select("k_lid", "k_rid", F.col("user_id").alias("k_user"))
        .toPandas()
    )
    lq = ", ".join(f"'{t}'" for t in case["l_types"])
    rq = ", ".join(f"'{t}'" for t in case["r_types"])
    sql = f"""
    SELECT l.event_id AS k_lid, r.event_id AS k_rid, l.user_id AS k_user
    FROM (SELECT * FROM events
          WHERE event_type IN ({lq}){_mod_sql(case)}) l
    JOIN (SELECT * FROM events
          WHERE event_type IN ({rq}){_mod_sql(case)}) r
      ON l.user_id = r.user_id
     AND r.ts BETWEEN l.ts - INTERVAL {bound} MINUTE AND l.ts
    """
    duck_pdf = con.execute(sql).df()
    issues = [
        f"stream-vs-batch {x}" for x in compare_frames(stream_pdf, batch_pdf)
    ]
    issues += [
        f"batch-vs-duck {x}" for x in compare_frames(batch_pdf, duck_pdf)
    ]
    return issues


def _run_dedup_wm(spark: SparkSession, con, sf_dir: str, case: dict) -> list:
    """dropDuplicatesWithinWatermark three ways; returns issues."""
    pdf = _stateful_src_pandas(spark, sf_dir, case)
    if not len(pdf):
        return []
    chunks = _slices(pdf, case["n_batches"])
    d = case["dup_tail"]
    out = []
    for i, ch in enumerate(chunks):
        parts = [ch]
        if i > 0:
            prev = chunks[i - 1]
            parts.insert(0, prev.iloc[-min(d, len(prev)):])  # dup COPIES
        out.append(pd.concat(parts) if len(parts) > 1 else parts[0])
    # event_id STAYS in the deduped row (round-9 ADVICE): the injected
    # copies above duplicate it too, so the intended within-watermark
    # drop is unchanged — but natural full-row (ts,type,user,value)
    # coincidences in the fixture become unique by construction, so the
    # stream==batch soundness argument no longer assumes the fixture is
    # free of far-apart natural duplicates.
    cols = ["ts", "event_type", "user_id", "value", "event_id"]
    schema = (
        "ts timestamp, event_type string, user_id long, value double,"
        " event_id long"
    )
    batches = [
        spark.createDataFrame(ch[cols], schema=schema)
        for ch in out
        if len(ch)
    ]
    if not batches:
        return []

    def build(stream: DataFrame) -> DataFrame:
        return (
            stream.withWatermark("ts", f"{case['delay_min']} minutes")
            .dropDuplicatesWithinWatermark()
            .select(
                F.col("ts").alias("k_ts"),
                F.col("event_type").alias("k_type"),
                F.col("user_id").alias("k_user"),
                F.col("value").alias("k_value"),
                F.col("event_id").alias("k_id"),
            )
        )

    from dataengineeringutils_spark.streaming.windows import run_streaming

    stream_pdf = run_streaming(
        spark, batches, f"sfz_dwm_{case['seed']}", build, output_mode="append"
    ).toPandas()
    src = batches[0]
    for b in batches[1:]:
        src = src.unionByName(b)
    batch_pdf = (
        src.dropDuplicates()
        .select(
            F.col("ts").alias("k_ts"),
            F.col("event_type").alias("k_type"),
            F.col("user_id").alias("k_user"),
            F.col("value").alias("k_value"),
            F.col("event_id").alias("k_id"),
        )
        .toPandas()
    )
    where = _where_sql(
        {"types": case.get("types"), "user_mod": case["user_mod"]}
    )
    sql = f"""
    SELECT DISTINCT ts AS k_ts, event_type AS k_type,
           user_id AS k_user, value AS k_value, event_id AS k_id
    FROM events{where}
    """
    duck_pdf = con.execute(sql).df()
    issues = [
        f"stream-vs-batch {x}" for x in compare_frames(stream_pdf, batch_pdf)
    ]
    issues += [
        f"batch-vs-duck {x}" for x in compare_frames(batch_pdf, duck_pdf)
    ]
    return issues


def run_stateful_case(
    spark: SparkSession, con, sf_dir: str, seed: int
) -> dict:
    """Run one stateful-family seed three ways (same contract as
    run_stream_case)."""
    case = gen_stateful_case(seed)
    try:
        if case["shape"] == "ssjoin":
            issues = _run_ssjoin(spark, con, sf_dir, case)
        else:
            issues = _run_dedup_wm(spark, con, sf_dir, case)
    except Exception as e:  # noqa: BLE001 — recorded, not swallowed
        issues = [f"exception: {type(e).__name__}: {e}"]
    return {
        "seed": seed,
        "ok": not issues,
        "shape": case["shape"],
        "sql": "",
        "issues": issues,
    }


# ---------------------------------------------------------------------------
# foreachBatch sink shape families (round-9 VERDICT #6): the two stateful
# sink mechanics with no fuzz family until round 10 — MERGE-upsert into a
# keyed table and txn-idempotent append into a transaction log. Both are
# DELIVERY-ORDER ROBUST by construction, which is what makes stream ==
# batch airtight with no watermark argument at all:
#
# upsert — KeyedTable keeps, per key, the max row under the strict total
# order (ts DESC, event_id DESC) [event_id unique ⇒ no ties across
# distinct rows], so the final state after ANY sequence of batches is the
# global per-key argmax of all delivered rows — independent of batch
# boundaries, delivery order, and REPLAYS (a re-delivered batch is a
# subset of already-merged rows and can never win over the row that beat
# it). The injected replay therefore exercises the crash-window
# re-delivery path while the oracle stays the plain QUALIFY argmax.
#
# txn_sink — LogTable.append with a (app, batch_id) txn action refuses a
# second append of the same txn id (returns -1), so per-batch partial
# aggregates sum to the exact source totals iff (a) every batch committed
# exactly once and (b) every injected replay — optionally across a log
# checkpoint, which must preserve the txn watermark — was refused.
# Totals are order-independent sums, so delivery order is irrelevant.
# ---------------------------------------------------------------------------


def gen_foreachbatch_case(seed: int) -> dict:
    """One seeded foreachBatch-sink case. Separate seed space (30M+) so
    the aggregate and stateful families' seed mappings never shift."""
    rng = random.Random(30_000_000 + seed)
    shape = rng.choice(["upsert", "txn_sink"])
    case: dict = {"shape": shape, "seed": seed}
    if rng.random() < 0.4:
        m = rng.randint(2, 5)
        case["user_mod"] = (m, rng.randrange(m))
    else:
        case["user_mod"] = None
    case["types"] = (
        sorted(rng.sample(_FIXTURE_TYPES, k=rng.randint(1, 3)))
        if rng.random() < 0.5
        else None
    )
    case["n_batches"] = rng.randint(2, 5)
    if shape == "upsert":
        # None = no replay; else re-deliver that batch index at the end
        case["replay"] = rng.choice([None] + list(range(case["n_batches"])))
    else:
        case["replay_set"] = sorted(
            rng.sample(
                range(case["n_batches"]), k=rng.randint(1, case["n_batches"])
            )
        )
        case["ckpt_before_replay"] = rng.random() < 0.5
    return case


_FB_COLS = ["event_id", "ts", "user_id", "value", "event_type"]
_FB_SCHEMA = (
    "event_id long, ts timestamp, user_id long, value double,"
    " event_type string"
)


def _fb_batches(spark: SparkSession, sf_dir: str, case: dict, base: str):
    """Write the case's contiguous time slices as one parquet file per
    batch under ``base``/src and return the batch DataFrames (empty
    slices dropped so batch ids are dense)."""
    import shutil

    pdf = _stateful_src_pandas(spark, sf_dir, case)
    if not len(pdf):
        return []
    chunks = [c for c in _slices(pdf, case["n_batches"]) if len(c)]
    sdfs = [
        spark.createDataFrame(ch[_FB_COLS], schema=_FB_SCHEMA)
        for ch in chunks
    ]
    shutil.rmtree(base, ignore_errors=True)
    for i, b in enumerate(sdfs):
        b.coalesce(1).write.mode("overwrite").parquet(f"{base}/src/batch={i}")
    return sdfs


def _run_upsert(spark: SparkSession, con, sf_dir: str, case: dict) -> list:
    """foreachBatch MERGE-upsert three ways; returns issues."""
    from dataengineeringutils_spark.keyed import KeyedTable
    from dataengineeringutils_spark.paths import ram_scratch_dir, scratch_dir
    from dataengineeringutils_spark.streaming.windows import _sink_counter

    base = scratch_dir(f"sfz_ups_{case['seed']}")
    sdfs = _fb_batches(spark, sf_dir, case, base)
    if not sdfs:
        return []
    kt = KeyedTable(
        spark, f"{base}/table", keys=["user_id"], order_by=["ts", "event_id"]
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        q = (
            spark.readStream.schema(sdfs[0].schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/src/batch=*")
            .writeStream.foreachBatch(lambda b, _id: kt.upsert(b))
            .option(
                "checkpointLocation",
                ram_scratch_dir(f"ck_sfzups_{next(_sink_counter)}"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if case["replay"] is not None and case["replay"] < len(sdfs):
            # crash-window re-delivery: must not change the final state
            kt.upsert(sdfs[case["replay"]])
        out_cols = [
            F.col("user_id").alias("k_user"),
            F.col("ts").alias("k_ts"),
            F.col("event_id").alias("k_id"),
            F.col("value").alias("k_value"),
        ]
        stream_pdf = kt.current().select(*out_cols).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    src = sdfs[0]
    for b in sdfs[1:]:
        src = src.unionByName(b)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    batch_pdf = (
        src.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*out_cols)
        .toPandas()
    )
    where = _where_sql(
        {"types": case.get("types"), "user_mod": case["user_mod"]}
    )
    sql = f"""
    SELECT user_id AS k_user, ts AS k_ts, event_id AS k_id,
           value AS k_value
    FROM events{where}
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """
    duck_pdf = con.execute(sql).df()
    issues = [
        f"stream-vs-batch {x}" for x in compare_frames(stream_pdf, batch_pdf)
    ]
    issues += [
        f"batch-vs-duck {x}" for x in compare_frames(batch_pdf, duck_pdf)
    ]
    return issues


def _run_txn_sink(spark: SparkSession, con, sf_dir: str, case: dict) -> list:
    """foreachBatch txn-idempotent log sink three ways; returns issues."""
    from dataengineeringutils_spark.paths import ram_scratch_dir, scratch_dir
    from dataengineeringutils_spark.streaming.windows import _sink_counter
    from dataengineeringutils_spark.txnlog import LogTable

    base = scratch_dir(f"sfz_txn_{case['seed']}")
    sdfs = _fb_batches(spark, sf_dir, case, base)
    if not sdfs:
        return []
    t = LogTable(spark, f"{base}/table")
    seen: list = []

    def write_batch(batch_df, batch_id):
        partial = batch_df.groupBy("event_type").agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("pv"),
        )
        t.append(partial, txn=("fz", batch_id))
        seen.append((partial, batch_id))

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    issues: list = []
    try:
        q = (
            spark.readStream.schema(_FB_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/src/batch=*")
            .writeStream.foreachBatch(write_batch)
            .option(
                "checkpointLocation",
                ram_scratch_dir(f"ck_sfztxn_{next(_sink_counter)}"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if case["ckpt_before_replay"]:
            t.checkpoint()  # consolidation must keep the txn watermark
        for i in case["replay_set"]:
            if i < len(seen):
                partial, bid = seen[i]
                if t.append(partial, txn=("fz", bid)) != -1:
                    issues.append(f"replay of txn batch {bid} not refused")
        stream_pdf = (
            t.snapshot()
            .groupBy("event_type")
            .agg(
                F.sum("pn").cast("bigint").alias("k_n"),
                F.sum("pv").cast("double").alias("k_sum"),
            )
            .select(F.col("event_type").alias("k_type"), "k_n", "k_sum")
            .toPandas()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    src = sdfs[0]
    for b in sdfs[1:]:
        src = src.unionByName(b)
    batch_pdf = (
        src.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("k_n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("k_sum"),
        )
        .select(F.col("event_type").alias("k_type"), "k_n", "k_sum")
        .toPandas()
    )
    where = _where_sql(
        {"types": case.get("types"), "user_mod": case["user_mod"]}
    )
    sql = f"""
    SELECT event_type AS k_type, CAST(COUNT(*) AS BIGINT) AS k_n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS k_sum
    FROM events{where}
    GROUP BY event_type
    """
    duck_pdf = con.execute(sql).df()
    issues += [
        f"stream-vs-batch {x}" for x in compare_frames(stream_pdf, batch_pdf)
    ]
    issues += [
        f"batch-vs-duck {x}" for x in compare_frames(batch_pdf, duck_pdf)
    ]
    return issues


def run_foreachbatch_case(
    spark: SparkSession, con, sf_dir: str, seed: int
) -> dict:
    """Run one foreachBatch-family seed three ways (same contract as
    run_stream_case)."""
    case = gen_foreachbatch_case(seed)
    try:
        if case["shape"] == "upsert":
            issues = _run_upsert(spark, con, sf_dir, case)
        else:
            issues = _run_txn_sink(spark, con, sf_dir, case)
    except Exception as e:  # noqa: BLE001 — recorded, not swallowed
        issues = [f"exception: {type(e).__name__}: {e}"]
    return {
        "seed": seed,
        "ok": not issues,
        "shape": case["shape"],
        "sql": "",
        "issues": issues,
    }


def run_stream_case(spark: SparkSession, con, sf_dir: str, seed: int) -> dict:
    """Run one seed three ways; returns {seed, ok, shape, sql, issues}."""
    case = gen_stream_case(seed)
    sql = ""
    try:
        pdf = _src_pandas(spark, sf_dir, case)
        if not len(pdf):
            return {"seed": seed, "ok": True, "shape": case["shape"],
                    "sql": "(empty source)", "issues": []}
        max_ts = pdf["ts"].max()
        sql = to_stream_sql(case, max_ts)
        batches = _batches(spark, pdf, case)
        src = batches[0]
        for b in batches[1:]:
            src = src.unionByName(b)
        batch_pdf = _spark_agg(case, src, max_ts).toPandas()
        stream_pdf = run_streaming(
            spark,
            batches,
            f"sfz_{seed}",
            _stream_build(case),
            output_mode="append",
        ).toPandas()
        duck_pdf = con.execute(sql).df()
        issues = [
            f"stream-vs-batch {d}"
            for d in compare_frames(stream_pdf, batch_pdf)
        ]
        issues += [
            f"batch-vs-duck {d}" for d in compare_frames(batch_pdf, duck_pdf)
        ]
    except Exception as e:  # noqa: BLE001 — recorded, not swallowed
        issues = [f"exception: {type(e).__name__}: {e}"]
    return {
        "seed": seed,
        "ok": not issues,
        "shape": case["shape"],
        "sql": sql,
        "issues": issues,
    }


# ---------------------------------------------------------------------------
# Checkpoint-recovery family (round-10 VERDICT #5): the one streaming
# path the other families never exercise — stop a query, restart it from
# its checkpoint, and (on half the seeds) make the stop UNCLEAN by
# deleting the newest commit-log entry, so the restart must REPLAY the
# last micro-batch: offset-log recovery, state-store version restore,
# watermark restoration, and the file sink's manifest-based exactly-once
# skip of an already-written batch all execute for real.
#
# SOUNDNESS: the aggregation shapes are gen_stream_case's (whose
# stream == batch argument is unchanged by a restart — checkpoint
# recovery restores exactly the offsets/watermark/state a continuous run
# would have had at the same point, and the replayed batch recomputes
# from the restored state version against identical input files). The
# settled sink is read THROUGH the sink manifest, so an unclean replay
# that double-wrote a batch would surface as duplicate rows in the
# stream-vs-batch compare rather than being silently hidden.
# ---------------------------------------------------------------------------


def gen_recovery_case(seed: int) -> dict:
    """gen_stream_case's aggregation shape + recovery knobs from an
    INDEPENDENT seeded stream (so widening this family never perturbs
    the agg family's seed mapping). ``kill_after`` = how many
    micro-batch files exist before the stop; ``unclean`` = delete the
    newest commit-log entry before restarting."""
    case = gen_stream_case(seed)
    rng = random.Random(77_000_000 + seed)
    case["n_batches"] = max(2, case["n_batches"])
    case["kill_after"] = rng.randint(1, case["n_batches"] - 1)
    case["unclean"] = rng.random() < 0.5
    return case


def _run_recovery(spark: SparkSession, con, sf_dir: str, case: dict) -> tuple[str, list]:
    import os
    import shutil

    from dataengineeringutils_spark.paths import ram_scratch_dir, scratch_dir
    from dataengineeringutils_spark.streaming.windows import _sink_counter

    pdf = _src_pandas(spark, sf_dir, case)
    if not len(pdf):
        return "(empty source)", []
    max_ts = pdf["ts"].max()
    sql = to_stream_sql(case, max_ts)
    batches = _batches(spark, pdf, case)
    # displacement merging can shrink the slice list; clamp the cut so
    # phase 1 always runs and phase 2 exists whenever >1 file does
    kill = min(case["kill_after"], max(1, len(batches) - 1))
    n = next(_sink_counter)
    src = scratch_dir(f"sfz_rec_src_{case['seed']}_{n}")
    out = scratch_dir(f"sfz_rec_out_{case['seed']}_{n}")
    ck = ram_scratch_dir(f"sfz_rec_ck_{case['seed']}_{n}")
    build = _stream_build(case)
    schema = batches[0].schema

    def run_phase() -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(f"{src}/batch=*")
        )
        q = (
            build(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled"
    )
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    # append-mode windowed aggs emit on watermark advance: the trailing
    # no-data batch is load-bearing in BOTH phases
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    try:
        for i, b in enumerate(batches[:kill]):
            b.coalesce(1).write.mode("overwrite").parquet(f"{src}/batch={i}")
        run_phase()
        if case["unclean"]:
            cdir = os.path.join(ck, "commits")
            ids = sorted(
                (f for f in os.listdir(cdir) if f.isdigit()), key=int
            )
            if ids:  # crash between offset write and commit write:
                os.remove(os.path.join(cdir, ids[-1]))
                # the local-FS ChecksumFs keeps a .N.crc sibling; a real
                # crash loses both, and a stale one collides with the
                # replayed commit's rename
                crc = os.path.join(cdir, f".{ids[-1]}.crc")
                if os.path.exists(crc):
                    os.remove(crc)
        for i, b in enumerate(batches[kill:], start=kill):
            b.coalesce(1).write.mode("overwrite").parquet(f"{src}/batch={i}")
        run_phase()
        try:
            stream_pdf = spark.read.parquet(out).toPandas()
        except Exception:  # noqa: BLE001 — zero rows ever emitted
            stream_pdf = None
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
        )
    srcdf = batches[0]
    for b in batches[1:]:
        srcdf = srcdf.unionByName(b)
    batch_pdf = _spark_agg(case, srcdf, max_ts).toPandas()
    if stream_pdf is None:
        stream_pdf = batch_pdf.iloc[0:0]
    duck_pdf = con.execute(sql).df()
    issues = [
        f"stream-vs-batch {d}" for d in compare_frames(stream_pdf, batch_pdf)
    ]
    issues += [
        f"batch-vs-duck {d}" for d in compare_frames(batch_pdf, duck_pdf)
    ]
    for d in (src, out):
        shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(ck, ignore_errors=True)
    return sql, issues


def run_recovery_case(
    spark: SparkSession, con, sf_dir: str, seed: int
) -> dict:
    """Run one checkpoint-recovery seed (same contract as
    run_stream_case); shape is tagged recovery/<agg-shape>/<clean|unclean>
    so the sweep artifact shows the kill-mode mix."""
    case = gen_recovery_case(seed)
    sql = ""
    try:
        sql, issues = _run_recovery(spark, con, sf_dir, case)
    except Exception as e:  # noqa: BLE001 — recorded, not swallowed
        issues = [f"exception: {type(e).__name__}: {e}"]
    mode = "unclean" if case["unclean"] else "clean"
    return {
        "seed": seed,
        "ok": not issues,
        "shape": f"recovery/{case['shape']}/{mode}",
        "sql": sql,
        "issues": issues,
    }
