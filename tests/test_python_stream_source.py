"""Offset/restart semantics of the custom streaming Python DataSource
(sources/python_stream_source.py — the message-queue stand-in).

The property a checkpointed bus consumer must have: a restarted query
resumes from the COMMITTED offset and processes only segments appended
since — no replay, no loss. Exercised with a real checkpoint directory
across two availableNow runs with an append in between.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from dataengineeringutils_spark.paths import scratch_dir
from dataengineeringutils_spark.sources.python_stream_source import (
    QueueDataSource,
    QueueStreamReader,
)


def _write_segment(base: str, part: int, seq: int, rows: list[dict]) -> None:
    d = os.path.join(base, f"p={part}")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"{seq:08d}.json"), "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in rows)


def _run_once(spark, base: str, ck: str, out: str):
    # file sink, not memory: the memory sink is not fault-tolerant and
    # refuses checkpoint recovery — the exact property under test here
    stream = spark.readStream.format("file_queue").option("path", base).load()
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def test_restart_reads_only_appended_segments(spark):
    spark.dataSource.register(QueueDataSource)
    base = scratch_dir("queue_restart_topic")
    ck = scratch_dir("queue_restart_ck")
    out = scratch_dir("queue_restart_out")
    _write_segment(base, 0, 0, [{"event_id": 1, "event_type": "a", "value": 1.0}])
    _write_segment(base, 1, 0, [{"event_id": 2, "event_type": "b", "value": 2.0}])

    first = _run_once(spark, base, ck, out)
    assert sorted(r["event_id"] for r in first.collect()) == [1, 2]

    # append one segment to partition 0 only, restart from the checkpoint:
    # the sink must grow by EXACTLY the appended message (no replay of
    # segments 0 — exactly-once across restarts)
    _write_segment(base, 0, 1, [{"event_id": 3, "event_type": "a", "value": 3.0}])
    second = _run_once(spark, base, ck, out)
    assert sorted(r["event_id"] for r in second.collect()) == [1, 2, 3]

    # a third run with nothing appended processes nothing new
    third = _run_once(spark, base, ck, out)
    assert sorted(r["event_id"] for r in third.collect()) == [1, 2, 3]


def test_partition_planning_matches_offset_ranges(spark):
    base = scratch_dir("queue_plan_topic")
    _write_segment(base, 0, 0, [{"event_id": 1, "event_type": "a", "value": 1.0}])
    _write_segment(base, 0, 1, [{"event_id": 2, "event_type": "a", "value": 1.0}])
    _write_segment(base, 1, 0, [{"event_id": 3, "event_type": "b", "value": 1.0}])
    r = QueueStreamReader({"path": base})
    assert r.initialOffset() == {"p=0": 0, "p=1": 0}
    latest = r.latestOffset()
    assert latest == {"p=0": 2, "p=1": 1}
    parts = r.partitions({"p=0": 1, "p=1": 1}, latest)
    # only partition 0 has new segments; its range is [1, 2)
    assert len(parts) == 1
    assert parts[0].start == 1 and parts[0].end == 2
    # read() yields Arrow RecordBatches (Spark 4 fast path); flatten to
    # row tuples for the assertion
    rows = [
        tuple(row.values())
        for batch in r.read(parts[0])
        for row in batch.to_pylist()
    ]
    assert rows == [(2, "a", 1.0)]


def test_paced_reader_restart_never_regresses_below_acks(spark):
    """Round-8 ADVICE: a rate-limited reader restarted from a checkpoint
    must not return a latestOffset below the committed position (Spark
    logs the regressed end, and the NEXT batch's [start, end) then
    re-reads committed segments). With a consumer ``group``, commit()
    acks to the broker-side sidecar and a fresh reader seeds its pacing
    base from it — latestOffset is monotone across restarts."""
    base = scratch_dir("queue_paced_topic")
    for i in range(4):
        _write_segment(base, 0, i, [{"event_id": i, "event_type": "a", "value": 1.0}])

    a = QueueStreamReader({"path": base, "max_segments_per_batch": "1", "group": "g1"})
    assert a.latestOffset() == {"p=0": 1}
    a.commit({"p=0": 1})
    assert a.latestOffset() == {"p=0": 2}
    a.commit({"p=0": 2})

    # restart: fresh reader instance, same group — paces from acks (2),
    # never from 0
    b = QueueStreamReader({"path": base, "max_segments_per_batch": "1", "group": "g1"})
    assert b.latestOffset() == {"p=0": 3}

    # the ack sidecar must be invisible to segment counting
    assert os.path.exists(os.path.join(base, "p=0"))
    c = QueueStreamReader({"path": base})
    assert c.latestOffset() == {"p=0": 4}

    # groupless fallback: partitions() re-seeds the base in-run, so a
    # replayed batch's checkpointed start still lifts the pacing floor
    d = QueueStreamReader({"path": base, "max_segments_per_batch": "1"})
    d.partitions({"p=0": 3}, {"p=0": 4})
    assert d.latestOffset()["p=0"] >= 3


def test_paced_restart_no_duplicate_delivery(spark):
    """End-to-end: paced (cap=1) grouped consumer, real checkpointed
    restart with an append in between — the sink holds each event
    exactly once. Without the ack-seeded pacing base, the restarted
    run's regressed latestOffset would replay committed segments."""
    import time as _t

    spark.dataSource.register(QueueDataSource)
    base = scratch_dir("queue_paced_restart_topic")
    ck = scratch_dir("queue_paced_restart_ck")
    out = scratch_dir("queue_paced_restart_out")

    def run_until(n_rows: int) -> list[int]:
        stream = (
            spark.readStream.format("file_queue")
            .option("path", base)
            .option("max_segments_per_batch", "1")
            .option("group", "exactly_once")
            .load()
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        t0 = _t.time()
        try:
            while _t.time() - t0 < 90:
                try:
                    if spark.read.parquet(out).count() >= n_rows:
                        break
                except Exception:
                    pass  # sink dir not created yet
                _t.sleep(0.2)
        finally:
            q.stop()
            q.awaitTermination()
        return sorted(r["event_id"] for r in spark.read.parquet(out).collect())

    for i in range(4):
        _write_segment(base, 0, i, [{"event_id": i, "event_type": "a", "value": 1.0}])
    assert run_until(4) == [0, 1, 2, 3]

    for i in range(4, 6):
        _write_segment(base, 0, i, [{"event_id": i, "event_type": "a", "value": 1.0}])
    # restart from the checkpoint: exactly the two appended events land,
    # nothing is replayed
    assert run_until(6) == [0, 1, 2, 3, 4, 5]


def test_stream_matches_batch_counts(spark, sf_dir):
    """The registered op's aggregate equals the straight batch aggregate
    over events — queue round-trip is lossless."""
    from dataengineeringutils_spark.registry import queries
    from dataengineeringutils_spark.tables import table

    got = {
        (r["event_type"], r["n_events"])
        for r in queries()["stream_python_queue_source"](spark, sf_dir).collect()
    }
    want = {
        (r["event_type"], r["n"])
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_jsonl_dir_writer_manifest_protocol(spark, tmp_path):
    """Read-back must trust the _MANIFEST only: orphan segments (dead
    task leftovers) and in-progress files are invisible; abort removes
    written segments."""
    import json
    import os

    from dataengineeringutils_spark.sources.python_datasource import (
        JsonlDirDataSource,
        JsonlDirWriter,
        _WrittenFile,
    )

    spark.dataSource.register(JsonlDirDataSource)
    out = str(tmp_path / "seg")
    os.makedirs(out)
    df = spark.createDataFrame([(i, f"v{i}") for i in range(20)], "k long, v string")
    df.repartition(3).write.format("jsonl_dir").mode("append").option(
        "path", out
    ).save()
    # plant a dead-task leftover and an uncommitted orphan segment
    with open(os.path.join(out, "seg-orphan.jsonl"), "w") as f:
        f.write(json.dumps({"k": 999, "v": "ghost"}) + "\n")
    with open(os.path.join(out, "seg-dead.jsonl.inprogress"), "w") as f:
        f.write("half a row")
    with open(os.path.join(out, "_MANIFEST")) as f:
        lines = [ln.split("\t") for ln in f.read().splitlines()]
    files = [p for p, _ in lines]
    assert sum(int(n) for _, n in lines) == 20
    back = spark.read.schema("k long, v string").json(files)
    assert back.count() == 20
    assert back.filter("k = 999").count() == 0
    # abort removes segments it was handed
    w = JsonlDirWriter({"path": out})
    w.abort([_WrittenFile(os.path.join(out, "seg-orphan.jsonl"), 1)])
    assert not os.path.exists(os.path.join(out, "seg-orphan.jsonl"))


def test_retention_deleted_segments_extent_and_read(spark):
    """Round-10 ADVICE: offsets are SEQUENCE NUMBERS — after retention
    deletes low-numbered segments, latestOffset must still report
    max(seq)+1 (the file COUNT would alias planned ranges onto exactly
    the deleted files), and read() must skip a deleted seq inside a
    planned range instead of raising FileNotFoundError."""
    base = scratch_dir("queue_retention_topic")
    for i in range(4):
        _write_segment(
            base, 0, i, [{"event_id": i, "event_type": "a", "value": 1.0}]
        )
    for i in range(2):  # retention removes the two oldest segments
        os.remove(os.path.join(base, "p=0", f"{i:08d}.json"))
    r = QueueStreamReader({"path": base})
    assert r.latestOffset() == {"p=0": 4}  # extent, not count (2)
    parts = r.partitions({"p=0": 0}, {"p=0": 4})
    rows = [row for b in r.read(parts[0]) for row in b.to_pylist()]
    assert sorted(row["event_id"] for row in rows) == [2, 3]


def test_whitespace_only_segment_yields_zero_rows(spark):
    """Round-10 ADVICE: the Arrow rewrite must keep the old per-line
    reader's tolerance for a segment containing only whitespace — zero
    rows, not an ArrowInvalid; real malformed content still raises."""
    import pytest

    base = scratch_dir("queue_blank_topic")
    _write_segment(
        base, 0, 0, [{"event_id": 1, "event_type": "a", "value": 1.0}]
    )
    with open(os.path.join(base, "p=0", f"{1:08d}.json"), "w") as f:
        f.write("\n   \n\t\n")
    with open(os.path.join(base, "p=0", f"{2:08d}.json"), "w") as f:
        f.write("{not json!\n")
    r = QueueStreamReader({"path": base})
    assert r.latestOffset() == {"p=0": 3}
    rows = [
        row
        for b in r.read(r.partitions({"p=0": 0}, {"p=0": 2})[0])
        for row in b.to_pylist()
    ]
    assert [row["event_id"] for row in rows] == [1]
    with pytest.raises(Exception):  # noqa: B017 — engine-specific type
        list(r.read(r.partitions({"p=0": 2}, {"p=0": 3})[0]))
