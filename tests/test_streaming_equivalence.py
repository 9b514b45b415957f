"""Streaming/batch equivalence (SURVEY.md §5.2): the B49 tumbling plan
executed as a real Structured Streaming job over micro-batches must equal
its batch declaration, and the stateful dedup stream must equal batch
distinct counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineeringutils_spark.streaming.windows import (
    run_streaming,
    stream_dedup_state,
    tumbling_agg,
)
from dataengineeringutils_spark.tables import table


def _as_sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    batch = tumbling_agg(ev)
    cutoff = ev.agg(F.expr("percentile_approx(ts, 0.5)")).collect()[0][0]
    batches = [ev.filter(F.col("ts") <= cutoff), ev.filter(F.col("ts") > cutoff)]
    # complete mode: no watermark -> final streamed state == batch result
    streamed = run_streaming(
        spark, batches, "test_stream_eq", tumbling_agg, output_mode="complete"
    )
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _as_sorted_rows(streamed, cols) == _as_sorted_rows(batch, cols)


def test_stream_dedup_equals_batch_distinct(spark, sf_dir):
    out = stream_dedup_state(spark, sf_dir)
    expected = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )
    cols = ["event_type", "n_events"]
    assert _as_sorted_rows(out, cols) == _as_sorted_rows(expected, cols)
