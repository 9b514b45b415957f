"""As-of (most-recent-at-or-before) join — B16.

Spark SQL has no batch ASOF JOIN (DuckDB does; pandas-on-Spark has
``merge_asof`` but materializes per-group pandas frames). This module
implements it with pure built-ins via the union+window technique:

1. Tag left rows (probes) and right rows (quotes) and union them.
2. Sort within each key partition by (event time, side) — right rows first
   on ties, giving inclusive `left.ts >= right.ts` semantics.
3. A running ``last(payload, ignorenulls=True)`` window carries the most
   recent right payload forward onto every left row.

Scale: one shuffle on the key + one sort — identical cost profile to a
sort-merge join, no per-group materialization, spillable, AQE-coalescible.
Skewed keys can be salted upstream; the window frame is running (no full
partition buffering).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineeringutils_spark.registry import query
from dataengineeringutils_spark.tables import table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    payload_prefix: str = "asof_",
    direction: str = "backward",
    strict: bool = False,
    tolerance: Column | None = None,
    carry: str = "last",
) -> DataFrame:
    """As-of join: for each left row, attach the payload of the nearest
    right row within ``by`` — the greatest ``right_ts <= left_ts``
    (``direction="backward"``, DuckDB ``>=``) or the smallest
    ``right_ts >= left_ts`` (``direction="forward"``, DuckDB ``<=``).

    ``strict=True`` excludes equal timestamps (DuckDB ``>`` / ``<``).
    Direction flips the sort; strictness flips which side wins ties of
    (ts): inclusive puts right rows first so the running carry sees them,
    strict puts left rows first so it doesn't. Left rows with no match
    get NULL payload. Cost is direction-independent: one shuffle + sort.

    ``tolerance`` (an interval Column, e.g. ``F.expr("INTERVAL 30
    MINUTES")``) is the pandas ``merge_asof``-style max gap: a match
    farther than the tolerance from the probe yields NULL payload. It is
    a residual filter on the carried match timestamp — plan unchanged.

    ``carry="first"`` attaches the EARLIEST in-range right row instead of
    the nearest (first-touch semantics): same window, ``first`` carry.
    """
    pay_struct: Column = F.struct(
        F.col(right_ts).alias("__mts"), *[F.col(c) for c in payload]
    )
    l_tag = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1)).withColumn(
        "__pay", F.lit(None).cast(right.select(pay_struct.alias("p")).schema["p"].dataType)
    )
    r_tag = (
        right.select(
            F.col(by),
            F.col(right_ts).alias("__ts"),
            F.lit(0).alias("__side"),
            pay_struct.alias("__pay"),
        )
    )
    # align columns: right rows carry NULL for left-only columns
    left_cols = [c for c in left.columns]
    r_full = r_tag.select(
        *[
            F.col(c) if c in (by,) else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left_cols
        ],
        "__ts",
        "__side",
        "__pay",
    )
    unioned = l_tag.select(*left_cols, "__ts", "__side", "__pay").unionByName(r_full)

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    ts_ord = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    side_ord = F.col("__side").desc() if strict else F.col("__side").asc()
    w = (
        Window.partitionBy(by)
        .orderBy(ts_ord, side_ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    agg_fn = F.last if carry == "last" else F.first
    carried = unioned.withColumn(
        "__carry", agg_fn("__pay", ignorenulls=True).over(w)
    )
    keep = None
    if tolerance is not None:
        mts = F.col("__carry").getField("__mts")
        gap = (
            F.col("__ts") - mts if direction == "backward" else mts - F.col("__ts")
        )
        keep = mts.isNotNull() & (gap <= tolerance)

    def field(c: str) -> Column:
        v = F.col("__carry").getField(c)
        return F.when(keep, v) if keep is not None else v

    out = carried.filter(F.col("__side") == 1).select(
        *left_cols,
        *[field(c).alias(f"{payload_prefix}{c}") for c in payload],
    )
    return out


@query(
    "join_asof",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           c.ts AS asof_click_ts,
           c.value AS asof_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16: for each purchase event, the most recent click (ts and value)
    by the same user at or before the purchase time."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts"), F.col("ts").alias("click_ts"), F.col("value").alias("click_value"))
    )
    joined = asof_join(
        purchases,
        clicks,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["click_ts", "click_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_click_ts"),
        F.col("asof_click_value"),
    )


@query(
    "join_asof_forward",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           c.ts AS next_click_ts,
           c.value AS next_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each purchase, the FIRST click by the same
    user at or after the purchase time (post-purchase behavior tracking).

    Same union+window machinery as the backward op with the sort
    reversed — demonstrating the direction knob costs nothing: still one
    shuffle + one sort, no per-group materialization.
    """
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join(
        purchases,
        clicks,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["click_ts", "click_value"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_click_ts").alias("next_click_ts"),
        F.col("asof_click_value").alias("next_click_value"),
    )


@query(
    "events_attribution",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           t.event_type AS touch_type,
           t.ts AS touch_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type <> 'purchase') t
      ON p.user_id = t.user_id AND p.ts > t.ts
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credited to the user's most
    recent non-purchase event STRICTLY before it.

    Strict backward as-of (DuckDB ``>``): an equal-timestamp touch does
    not get credit. The touch candidate set is every other event type,
    so this is the one-pass marketing-attribution query shape.
    """
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("ts"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("touch_ts"),
    )
    joined = asof_join(
        purchases,
        touches,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["touch_type", "touch_ts"],
        direction="backward",
        strict=True,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_touch_type").alias("touch_type"),
        F.col("asof_touch_ts").alias("touch_ts"),
    )


@query(
    "join_asof_tolerance",
    oracle="""
    SELECT event_id,
           user_id,
           CASE WHEN p_ts - m_ts <= INTERVAL 30 MINUTE THEN m_ts END
               AS asof_click_ts,
           CASE WHEN p_ts - m_ts <= INTERVAL 30 MINUTE THEN m_value END
               AS asof_click_value
    FROM (
        SELECT p.event_id, p.user_id, p.ts AS p_ts,
               c.ts AS m_ts, c.value AS m_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a 30-minute tolerance: a click older than
    the tolerance does not count as the purchase's antecedent (pandas
    ``merge_asof(tolerance=...)`` parity). Same one-shuffle union+window
    plan as ``join_asof``; the tolerance is a residual null-out on the
    carried match timestamp."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join(
        purchases,
        clicks,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["click_ts", "click_value"],
        tolerance=F.expr("INTERVAL 30 MINUTES"),
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_click_ts"),
        F.col("asof_click_value"),
    )


@query(
    "events_first_touch",
    oracle="""
    WITH firsts AS (
        SELECT user_id, event_type AS touch_type, ts AS touch_ts
        FROM events
        WHERE event_type <> 'purchase'
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC) = 1
    )
    SELECT p.event_id,
           p.user_id,
           CASE WHEN f.touch_ts <= p.ts THEN f.touch_type END AS touch_type,
           CASE WHEN f.touch_ts <= p.ts THEN f.touch_ts END AS touch_ts
    FROM events p
    LEFT JOIN firsts f ON p.user_id = f.user_id
    WHERE p.event_type = 'purchase'
    """,
)
def events_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each purchase credited to the user's
    EARLIEST non-purchase event at or before it — the acquisition-side
    twin of ``events_attribution`` (last-touch).

    Identical one-shuffle union+window plan; the only change is the
    carry aggregate (``first`` instead of ``last``), which is exactly why
    the as-of machinery is a reusable operator, not a one-off query.
    """
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("ts"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("touch_ts"),
    )
    joined = asof_join(
        purchases,
        touches,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["touch_type", "touch_ts"],
        carry="first",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_touch_type").alias("touch_type"),
        F.col("asof_touch_ts").alias("touch_ts"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
    back AS (
        SELECT p.event_id, p.user_id, p.ts AS p_ts,
               c.ts AS b_ts, c.value AS b_value
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    ),
    fwd AS (
        SELECT p.event_id, c.ts AS f_ts, c.value AS f_value
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts <= c.ts
    )
    SELECT b.event_id, b.user_id,
           CASE WHEN f_ts IS NULL THEN b_ts
                WHEN b_ts IS NULL THEN f_ts
                WHEN (p_ts - b_ts) <= (f_ts - p_ts) THEN b_ts
                ELSE f_ts END AS nearest_ts,
           CASE WHEN f_ts IS NULL THEN b_value
                WHEN b_ts IS NULL THEN f_value
                WHEN (p_ts - b_ts) <= (f_ts - p_ts) THEN b_value
                ELSE f_value END AS nearest_value
    FROM back b JOIN fwd f ON b.event_id = f.event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join (pandas ``merge_asof(direction=
    'nearest')`` parity): each purchase takes whichever click — last
    before or first after — is closer in absolute time; exact ties
    prefer backward (the pandas rule). Completes the as-of family
    (backward B16 / forward B112 / strict / tolerance B177 / first-touch
    B201).

    Two one-shuffle union+window passes (one per direction) on the same
    keys — the second pass re-uses the first's co-partitioning — then a
    per-row gap comparison; no extra join against the right side.
    """
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    back = asof_join(
        purchases, clicks, by="user_id", left_ts="ts", right_ts="ts",
        payload=["click_ts", "click_value"], payload_prefix="b_",
    ).select(
        "event_id", "user_id", F.col("ts").alias("p_ts"),
        F.col("b_click_ts"), F.col("b_click_value"),
    )
    fwd = asof_join(
        purchases, clicks, by="user_id", left_ts="ts", right_ts="ts",
        payload=["click_ts", "click_value"], payload_prefix="f_",
        direction="forward",
    ).select("event_id", F.col("f_click_ts"), F.col("f_click_value"))
    j = back.join(fwd, "event_id")
    take_back = (
        F.col("f_click_ts").isNull()
        | (
            F.col("b_click_ts").isNotNull()
            & (
                (F.unix_micros("p_ts") - F.unix_micros("b_click_ts"))
                <= (F.unix_micros("f_click_ts") - F.unix_micros("p_ts"))
            )
        )
    )
    return j.select(
        "event_id",
        "user_id",
        F.when(take_back, F.col("b_click_ts"))
        .otherwise(F.col("f_click_ts"))
        .alias("nearest_ts"),
        F.when(take_back, F.col("b_click_value"))
        .otherwise(F.col("f_click_value"))
        .alias("nearest_value"),
    )
