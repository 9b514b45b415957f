"""LogTable (transaction-log table format) semantics: commit replay,
time travel, compaction neutrality, snapshot isolation."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from dataengineeringutils_spark.paths import scratch_dir
from dataengineeringutils_spark.tables import table
from dataengineeringutils_spark.txnlog import LogTable

SF = "/root/testdata/sf0.001"


def _fresh(spark):
    return LogTable(spark, scratch_dir("txn_test_" + uuid.uuid4().hex))


def test_append_time_travel_and_compaction(spark):
    o = table(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    first = o.filter(F.col("o_orderkey") % 2 == 0)
    second = o.filter(F.col("o_orderkey") % 2 != 0)
    t = _fresh(spark)
    v0 = t.append(first, n_files=2)
    v1 = t.append(second, n_files=2)
    assert (v0, v1) == (0, 1)
    n_first, n_all = first.count(), o.count()
    # time travel: version 0 sees only the first commit
    assert t.snapshot(0).count() == n_first
    assert t.snapshot().count() == n_all
    assert len(t.live_files()) == 4
    # compaction: one live file, same rows, history intact
    t.compact(n_files=1)
    assert len(t.live_files()) == 1
    assert t.snapshot().count() == n_all
    assert t.snapshot(1).count() == n_all  # pre-compaction replay
    assert t.snapshot(0).count() == n_first
    got = {
        (r["o_orderstatus"], r["n"])
        for r in t.snapshot().groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    want = {
        (r["o_orderstatus"], r["n"])
        for r in o.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_snapshot_isolation_under_concurrent_append(spark):
    o = table(spark, SF, "orders").select("o_orderkey")
    t = _fresh(spark)
    t.append(o.limit(10))
    pinned = t.live_files(0)
    t.append(o.limit(5))  # writer commits while "reader" holds v0
    # the pinned reader's file set is unchanged and still readable
    assert t.live_files(0) == pinned
    assert t.snapshot(0).count() == 10
    assert t.snapshot().count() == 15
