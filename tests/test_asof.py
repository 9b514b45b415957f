"""Semantics tests for the as-of join (B16) — pinned edge cases:
ties match (>=), no-earlier-row gives NULL, latest-wins."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dataengineeringutils_spark.operators.asof import asof_join


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, ts("2024-01-01T10:00:00")),  # after both quotes
            (2, 10, ts("2024-01-01T09:00:00")),  # exactly at quote 2 -> tie matches
            (3, 10, ts("2024-01-01T07:00:00")),  # before all quotes -> NULL
            (4, 20, ts("2024-01-01T10:00:00")),  # other key, no quotes -> NULL
        ],
        schema="event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, ts("2024-01-01T08:00:00"), 1.0),
            (10, ts("2024-01-01T09:00:00"), 2.0),
        ],
        schema="user_id long, ts timestamp, q_val double",
    ).select("user_id", "ts", F.col("ts").alias("q_ts"), "q_val")

    out = asof_join(
        left,
        right,
        by="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["q_ts", "q_val"],
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[1]["asof_q_ts"] == ts("2024-01-01T09:00:00")  # latest at/before
    assert rows[1]["asof_q_val"] == 2.0
    assert rows[2]["asof_q_ts"] == ts("2024-01-01T09:00:00")  # tie (>=) matches
    assert rows[3]["asof_q_ts"] is None
    assert rows[4]["asof_q_ts"] is None
    assert out.count() == 4  # left rows preserved exactly
