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
