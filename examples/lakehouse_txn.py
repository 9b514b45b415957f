"""The transaction-log table surface, end to end: append with file
stats -> MERGE upsert -> DELETE WHERE -> stats-pruned range scan ->
row-level change feed -> idempotent (appId, batchId) txn commits ->
log checkpoint -> time travel.

This is the workflow a lakehouse user runs against Delta/Iceberg; here
it runs against ``txnlog.LogTable`` (same call shapes) so every
mechanic is exercised offline. Run standalone:
``python examples/lakehouse_txn.py [sf_dir]``.
"""

from __future__ import annotations

import os
import sys
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(spark, sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from dataengineeringutils_spark.paths import scratch_dir
    from dataengineeringutils_spark.tables import table
    from dataengineeringutils_spark.txnlog import LogTable

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").alias("d"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    t = LogTable(spark, scratch_dir("example_txn_" + uuid.uuid4().hex))

    # 1. yearly appends, each committing per-file min/max date stats
    for y in range(1995, 1999):
        t.append(o.filter(F.year("d") == y), stats_col="d")
    v_loaded = t._versions()[-1]

    # 2. stats-based data skipping: the 1996 scan opens 1 file of 4
    hit, n_scanned, n_total = t.scan_where(
        "d", "1996-01-01 00:00:00", "1996-12-31 23:59:59"
    )
    assert n_scanned == 1 and n_total == 4, (n_scanned, n_total)
    print(f"skipping scan: {n_scanned}/{n_total} files, "
          f"{hit.count()} rows")

    # 3. MERGE upsert (repriced keys) + DELETE WHERE, one commit each
    src = o.filter((F.year("d") == 1995) & (F.col("k") % 10 == 0)).select(
        "k", "d", (F.col("price") * 2).cast("decimal(18,2)").alias("price")
    )
    t.merge(src, keys=["k"])
    t.delete_where("k % 100 = 0")

    # 4. row-level change feed since the initial load
    feed = t.change_feed(v_loaded, None, keys=["k"])
    counts = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type").agg(
            F.count("*").alias("n")
        ).collect()
    }
    print("change feed:", counts)
    assert counts.get("delete", 0) > 0
    assert counts.get("update_postimage", 0) == counts.get(
        "update_preimage", 0
    )

    # 5. idempotent micro-batch commits: a replayed batch is a no-op,
    #    before AND after a log checkpoint
    partial = src.groupBy(F.year("d").alias("y")).agg(
        F.count("*").alias("n")
    )
    d_type = o.schema["d"].dataType  # fixture eras differ (ntz vs tz)
    batch = partial.select(
        F.col("y").cast("bigint").alias("k"),
        F.lit(None).cast(d_type).alias("d"),
        F.col("n").cast("decimal(18,2)").alias("price"),
    )
    assert t.append(batch, txn=("job", 0)) >= 0
    replay = t.append(batch, txn=("job", 0))
    assert replay == -1, "replayed batch must be a no-op"
    t.checkpoint()
    assert t.last_txn_version("job") == 0

    # 6. time travel: the initial load is still exactly readable
    n_then = t.snapshot(v_loaded).count()
    n_now = t.snapshot().count()
    print(f"time travel: v{v_loaded} had {n_then} rows, head has {n_now}")
    assert n_then != n_now


if __name__ == "__main__":
    from dataengineeringutils_spark.session import get_spark

    main(
        get_spark("example_lakehouse"),
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
    )
