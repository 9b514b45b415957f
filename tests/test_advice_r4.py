"""Pins for the five round-4 ADVICE findings (all low severity):

1. paths.ram_scratch_dir falls back when /dev/shm root is UNWRITABLE
   (not just absent).
2. JsonlDirWriter append mode merges the existing _MANIFEST; overwrite
   replaces it.
3. JsonlDirWriter.abort tolerates None commit messages (failed tasks).
4. two_phase_global_rank keeps NULL-valued rows (sentinel bucket), with
   Spark's default null ordering semantics in both directions.
5. KeyedTable intra-batch ties (equal keys + full order_by) resolve
   deterministically, independent of partitioning.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


def test_ram_scratch_dir_falls_back_when_root_unwritable(tmp_path, monkeypatch):
    from dataengineeringutils_spark import paths

    # a path under a plain FILE: makedirs raises NotADirectoryError
    # (OSError), same class of failure as a foreign-uid /dev/shm dir
    blocker = tmp_path / "blocker"
    blocker.write_text("x")
    monkeypatch.setattr(paths, "_RAM_ROOT", str(blocker / "deu_spark_scratch"))
    d = paths.ram_scratch_dir("unit_test_unwritable")
    assert os.path.isdir(d)
    assert d.startswith(paths._SCRATCH_ROOT)
    # and the bad root was remembered: second call goes straight through
    d2 = paths.ram_scratch_dir("unit_test_unwritable")
    assert d2 == d


def test_jsonl_dir_append_merges_manifest(spark, tmp_path):
    from dataengineeringutils_spark.sources.python_datasource import (
        JsonlDirDataSource,
    )

    spark.dataSource.register(JsonlDirDataSource)
    out = str(tmp_path / "seg")
    os.makedirs(out)
    a = spark.createDataFrame([(i, "a") for i in range(10)], "k long, v string")
    b = spark.createDataFrame([(i, "b") for i in range(5)], "k long, v string")
    a.repartition(2).write.format("jsonl_dir").mode("append").option("path", out).save()
    b.repartition(2).write.format("jsonl_dir").mode("append").option("path", out).save()
    with open(os.path.join(out, "_MANIFEST")) as f:
        lines = [ln.split("\t") for ln in f.read().splitlines()]
    # the second append must keep the first batch's segments listed
    assert sum(int(n) for _, n in lines) == 15
    back = spark.read.schema("k long, v string").json([p for p, _ in lines])
    assert back.count() == 15
    assert back.filter("v = 'a'").count() == 10
    # overwrite resets the manifest to the new batch only
    b.write.format("jsonl_dir").mode("overwrite").option("path", out).save()
    with open(os.path.join(out, "_MANIFEST")) as f:
        lines = [ln.split("\t") for ln in f.read().splitlines()]
    assert sum(int(n) for _, n in lines) == 5


def test_jsonl_dir_abort_skips_none_messages(tmp_path):
    from dataengineeringutils_spark.sources.python_datasource import (
        JsonlDirWriter,
        _WrittenFile,
    )

    out = str(tmp_path / "seg")
    os.makedirs(out)
    seg = os.path.join(out, "seg-x.jsonl")
    with open(seg, "w") as f:
        f.write(json.dumps({"k": 1}) + "\n")
    w = JsonlDirWriter({"path": out})
    # Spark passes None for tasks that never completed
    w.abort([None, _WrittenFile(seg, 1), None])
    assert not os.path.exists(seg)
    # commit likewise tolerates a None slot
    w.commit([None, _WrittenFile(seg, 0)])
    assert os.path.exists(os.path.join(out, "_MANIFEST"))


@pytest.mark.parametrize("descending", [False, True])
def test_two_phase_global_rank_keeps_null_values(spark, descending):
    from dataengineeringutils_spark.operators.windows import (
        two_phase_global_rank,
    )

    rows = [(3, 1), (None, 2), (1, 3), (None, 4), (2, 5)]
    df = spark.createDataFrame(rows, "v int, tie int")
    got = {
        (r["tie"], r["rn"], r["n"])
        for r in two_phase_global_rank(
            df, "v", "tie", cuts=[1, 2], descending=descending
        ).collect()
    }
    assert len(got) == 5, "NULL-valued rows must not vanish"
    # Spark default null ordering: NULLS FIRST under asc, LAST under desc
    if descending:
        order = [(1, 3), (5, 2), (3, 1), (2, None), (4, None)]
    else:
        order = [(2, None), (4, None), (3, 1), (5, 2), (1, 3)]
    want = {(tie, i + 1, 5) for i, (tie, _) in enumerate(order)}
    assert got == want


def test_keyed_table_intra_batch_ties_deterministic(spark, tmp_path):
    from dataengineeringutils_spark.keyed import KeyedTable

    # two rows tied on (key, ts) with different payloads — the winner
    # must be a pure function of the data, not of partition placement
    batch = [(1, 10, "p%d" % i) for i in range(6)]
    winners = set()
    for nparts in (1, 2, 6):
        t = KeyedTable(
            spark,
            str(tmp_path / f"kt{nparts}"),
            keys=["k"],
            order_by=["ts"],
        )
        df = spark.createDataFrame(batch, "k int, ts int, v string").repartition(
            nparts
        )
        t.upsert(df)
        winners.add(t.current().collect()[0]["v"])
    assert len(winners) == 1, f"tie winner varies with partitioning: {winners}"
