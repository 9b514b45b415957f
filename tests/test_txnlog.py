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


def test_commit_is_put_if_absent(spark):
    """Two writers racing for one version: the loser must get a
    ConcurrentCommitError, never a silent clobber (round-2 ADVICE)."""
    import pytest

    from dataengineeringutils_spark.txnlog import ConcurrentCommitError

    o = table(spark, SF, "orders").select("o_orderkey")
    t = _fresh(spark)
    t.append(o.limit(10))
    # simulate writer B committing version 1 out from under writer A
    actions_b = t._write_files(o.limit(3), 1)
    t._commit(actions_b)
    # writer A prepared against the stale latest and races with retries=0
    actions_a = [{"add": {"path": "data/phantom.parquet", "num_records": None}}]
    with pytest.raises(ConcurrentCommitError):
        # force the race: try to claim the already-taken version number
        import json
        import os
        import uuid as _uuid

        tmp = os.path.join(t.log_dir, f".{_uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.writelines(json.dumps(a) + "\n" for a in actions_a)
        try:
            os.link(tmp, os.path.join(t.log_dir, f"{1:08d}.json"))
        except FileExistsError:
            raise ConcurrentCommitError("version 1 taken") from None
        finally:
            os.unlink(tmp)
    # the winning commit's rows are all intact
    assert t.snapshot().count() == 13
    # blind appends RETRY past the conflict and land on the next version
    v = t.append(o.limit(2))
    assert v == 2
    assert t.snapshot().count() == 15


def test_schema_evolution_through_log(spark):
    """Add-column commit: old files read as NULL for the new column;
    time travel below the schema commit sees the old schema; a
    mismatched append without evolve_schema raises."""
    import pytest

    o = table(spark, SF, "orders")
    t = _fresh(spark)
    t.append(o.select("o_orderkey").limit(10))
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(o.select("o_orderkey", "o_orderstatus").limit(5))
    t.append(
        o.select("o_orderkey", "o_orderstatus").limit(5), evolve_schema=True
    )
    cur = t.snapshot()
    assert cur.columns == ["o_orderkey", "o_orderstatus"]
    assert cur.count() == 15
    # the 10 pre-evolution rows surface NULL for the added column
    assert cur.filter(F.col("o_orderstatus").isNull()).count() == 10
    # VERSION AS OF below the schema commit: old schema
    assert t.snapshot(0).columns == ["o_orderkey"]
    # type changes are refused
    with pytest.raises(ValueError, match="cannot evolve"):
        t.append(
            t.snapshot().withColumn(
                "o_orderstatus", F.col("o_orderkey").cast("long")
            ),
            evolve_schema=True,
        )


def test_log_checkpoint_replay(spark):
    """Checkpoint consolidates the live state: replay after it reads the
    checkpoint + later commits only; snapshots (latest AND time travel
    below the checkpoint) are unchanged; schema survives through it."""
    o = table(spark, SF, "orders")
    t = _fresh(spark)
    t.append(o.select("o_orderkey").limit(10))
    t.append(o.select("o_orderkey").limit(6))
    t.compact(n_files=1)
    t.append(
        o.select("o_orderkey", "o_orderstatus").limit(4), evolve_schema=True
    )
    cp = t.checkpoint()
    assert cp == 3
    # post-checkpoint append: replay = checkpoint + 1 commit
    t.append(o.select("o_orderkey", "o_orderstatus").limit(5))
    assert t.snapshot().count() == 25
    assert t.snapshot().columns == ["o_orderkey", "o_orderstatus"]
    # time travel BELOW the checkpoint still replays raw commits
    assert t.snapshot(0).count() == 10
    assert t.snapshot(1).count() == 16
    # replay from the checkpoint yields exactly the live set at cp
    assert len(t._read_log(cp)) == len(t.live_files(cp)) + 1  # + metaData
    # re-checkpoint at the new latest; both checkpoints coexist
    assert t.checkpoint() == 4
    assert t.snapshot().count() == 25
    assert t.snapshot(3).count() == 20


def test_delete_where_after_schema_evolution(spark):
    """COW delete straddling a schema-evolution commit: the rewrite must
    read schema-RECONCILED (mergeSchema + NULL fill), or a plain
    multi-file read takes one file's footer schema and silently drops
    the evolved column from every survivor (the data-loss bug this test
    pinned: all survivors came back NULL)."""
    o = table(spark, SF, "orders")
    t = _fresh(spark)
    t.append(o.select("o_orderkey").limit(10))
    t.append(
        o.select("o_orderkey", "o_orderstatus").limit(6), evolve_schema=True
    )
    t.delete_where("o_orderkey % 2 = 0")
    snap = t.snapshot()
    assert snap.columns == ["o_orderkey", "o_orderstatus"]
    # no deleted key survives; every surviving evolved row keeps its status
    assert snap.filter("o_orderkey % 2 = 0").count() == 0
    survivors_evolved = (
        o.select("o_orderkey", "o_orderstatus")
        .limit(6)
        .filter("o_orderkey % 2 <> 0")
        .count()
    )
    assert (
        snap.filter(F.col("o_orderstatus").isNotNull()).count()
        == survivors_evolved
    )
    # deleted rows still visible via time travel below the delete commit
    assert t.snapshot(1).count() == 16


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


def test_delete_where_keeps_null_predicate_rows(spark):
    """DELETE removes rows where the predicate is TRUE; rows where it
    evaluates NULL must SURVIVE the copy-on-write rewrite (round-3
    ADVICE high: bare NOT(pred) dropped them — three-valued logic)."""
    rows = [(1, "F"), (2, "O"), (3, None), (4, None)]
    df = spark.createDataFrame(rows, "k int, status string")
    t = _fresh(spark)
    t.append(df, n_files=1)
    t.delete_where("status = 'F'")
    got = {(r["k"], r["status"]) for r in t.snapshot().collect()}
    assert got == {(2, "O"), (3, None), (4, None)}


def test_delete_where_null_rows_after_schema_evolution(spark):
    """Schema evolution NULL-fills old files; a delete on the evolved
    column must not wipe those NULL rows."""
    t = _fresh(spark)
    t.append(spark.createDataFrame([(1,), (2,)], "k int"), n_files=1)
    t.append(
        spark.createDataFrame([(3, "bad"), (4, "ok")], "k int, tag string"),
        n_files=1,
        evolve_schema=True,
    )
    t.delete_where("tag = 'bad'")
    got = {(r["k"], r["tag"]) for r in t.snapshot().collect()}
    assert got == {(1, None), (2, None), (4, "ok")}


def test_delete_where_no_match_burns_no_version(spark):
    """A no-op delete returns the current version without committing."""
    t = _fresh(spark)
    v0 = t.append(spark.createDataFrame([(1,)], "k int"))
    v = t.delete_where("k = 999")
    assert v == v0
    assert t._versions() == [v0]
    assert t.snapshot().count() == 1
    assert t.last_delete_count == 0


def test_delete_where_counts_removed_rows_in_probe(spark):
    """The probe job counts the predicate-TRUE rows it locates, so
    callers reporting the removed-row total need no separate
    before/after count jobs (round 12: sink_txn_delete_where dropped
    two full-snapshot counts). The count must equal the actual
    row-count delta across the COW commit, including rows spread over
    multiple files and NULL-predicate survivors."""
    rows = [(1, "F"), (2, "O"), (3, "F"), (4, None), (5, "F"), (6, "O")]
    t = _fresh(spark)
    t.append(spark.createDataFrame(rows, "k int, status string"), n_files=3)
    n_before = t.snapshot().count()
    t.delete_where("status = 'F'")
    assert t.last_delete_count == n_before - t.snapshot().count() == 3


def test_append_column_order_insensitive(spark):
    """Same (name, type) set in a different column order is a blind
    append — no raise, no redundant metaData commit (round-3 ADVICE)."""
    t = _fresh(spark)
    t.append(spark.createDataFrame([(1, "a")], "k int, s string"))
    t.append(spark.createDataFrame([("b", 2)], "s string, k int"))
    assert t.schema_at() is not None
    # exactly one metaData action ever committed (the initial one)
    metas = [a for a in t._read_log() if "metaData" in a]
    assert len(metas) == 1
    got = {(r["k"], r["s"]) for r in t.snapshot().collect()}
    assert got == {(1, "a"), (2, "b")}


def test_append_evolve_noop_schema_commits_no_metadata(spark):
    """evolve_schema=True with a column-subset frame must not log a
    redundant metaData action (merged schema unchanged)."""
    t = _fresh(spark)
    t.append(spark.createDataFrame([(1, "a")], "k int, s string"))
    import pytest

    with pytest.raises(ValueError):
        t.append(spark.createDataFrame([(2,)], "k int"))
    t.append(spark.createDataFrame([(2,)], "k int"), evolve_schema=True)
    metas = [a for a in t._read_log() if "metaData" in a]
    assert len(metas) == 1
    got = {(r["k"], r["s"]) for r in t.snapshot().collect()}
    assert got == {(1, "a"), (2, None)}


def test_merge_upsert_semantics(spark):
    """MERGE: matched keys replaced, unmatched target rows kept,
    unmatched source rows inserted — in ONE commit."""
    t = _fresh(spark)
    t.append(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string"),
        n_files=2,
    )
    v_before = t._versions()[-1]
    t.merge(
        spark.createDataFrame([(2, "B"), (9, "Z")], "k int, v string"),
        keys=["k"],
    )
    got = {(r["k"], r["v"]) for r in t.snapshot().collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (9, "Z")}
    assert t._versions()[-1] == v_before + 1  # exactly one commit
    # time travel below the merge still sees the pre-merge rows
    before = {(r["k"], r["v"]) for r in t.snapshot(v_before).collect()}
    assert before == {(1, "a"), (2, "b"), (3, "c")}


def test_merge_pure_insert_and_schema_guard(spark):
    import pytest

    t = _fresh(spark)
    t.append(spark.createDataFrame([(1, "a")], "k int, v string"))
    t.merge(spark.createDataFrame([(2, "b")], "k int, v string"), keys=["k"])
    assert t.snapshot().count() == 2
    with pytest.raises(ValueError):
        t.merge(spark.createDataFrame([(3,)], "k int"), keys=["k"])


def test_merge_into_empty_table_is_append(spark):
    t = _fresh(spark)
    t.merge(spark.createDataFrame([(1, "a")], "k int, v string"), keys=["k"])
    assert {(r["k"], r["v"]) for r in t.snapshot().collect()} == {(1, "a")}


def test_stats_skipping_scan(spark):
    t = _fresh(spark)
    for lo, hi in ((0, 9), (10, 19), (20, 29)):
        t.append(
            spark.range(lo, hi + 1).selectExpr("id AS k", "id * 2 AS v"),
            stats_col="k",
        )
    df, scanned, total = t.scan_where("k", 12, 17)
    assert (scanned, total) == (1, 3)
    assert {r["k"] for r in df.collect()} == set(range(12, 18))
    # boundary-touching range intersects two files
    _, scanned2, _ = t.scan_where("k", 9, 10)
    assert scanned2 == 2
    # disjoint range scans nothing and returns an empty, schema-stable df
    empty, scanned3, _ = t.scan_where("k", 100, 200)
    assert scanned3 == 0 and empty.count() == 0
    assert empty.columns == ["k", "v"]


def test_stats_skipping_conservative_without_stats(spark):
    t = _fresh(spark)
    t.append(spark.range(0, 10).selectExpr("id AS k"))  # no stats
    t.append(spark.range(50, 60).selectExpr("id AS k"), stats_col="k")
    df, scanned, total = t.scan_where("k", 0, 5)
    # the stats-less file cannot be pruned; the out-of-range one can
    assert (scanned, total) == (1, 2)
    assert df.count() == 6


def test_txn_action_idempotence_and_checkpoint(spark):
    t = _fresh(spark)
    b = spark.createDataFrame([(1, 10.0)], "k int, v double")
    assert t.append(b, txn=("app", 0)) >= 0
    assert t.append(b, txn=("app", 0)) == -1  # replay is a no-op
    assert t.snapshot().count() == 1
    assert t.append(b, txn=("app", 1)) >= 0  # next batch commits
    assert t.append(b, txn=("other", 0)) >= 0  # appIds are independent
    assert t.last_txn_version("app") == 1
    t.checkpoint()
    # watermark survives consolidation: replay below it is still a no-op
    assert t.append(b, txn=("app", 1)) == -1
    assert t.append(b, txn=("app", 0)) == -1
    assert t.snapshot().count() == 3


def test_change_feed_row_level(spark):
    t = _fresh(spark)
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
        )
    )
    t.merge(
        spark.createDataFrame([(2, "B"), (4, "d")], "k int, v string"),
        keys=["k"],
    )
    t.delete_where("k = 3")
    got = {
        (r["_change_type"], r["k"], r["v"])
        for r in t.change_feed(0, None, keys=["k"]).collect()
    }
    assert got == {
        ("insert", 4, "d"),
        ("delete", 3, "c"),
        ("update_preimage", 2, "b"),
        ("update_postimage", 2, "B"),
    }
    # no-op span: identical versions yield an empty feed
    assert t.change_feed(2, 2, keys=["k"]).count() == 0


def test_restore_is_metadata_only_and_preserves_history(spark):
    t = _fresh(spark)
    v0 = t.append(
        spark.createDataFrame([(i, i * 2) for i in range(10)], "k int, v int"),
        n_files=2,
    )
    t.delete_where("k >= 5")
    assert t.snapshot().count() == 5
    import os

    def files():
        root = os.path.join(t.base, "data")
        return {
            os.path.join(sub, f)
            for sub in os.listdir(root)
            for f in os.listdir(os.path.join(root, sub))
            if f.endswith(".parquet")
        }

    before = files()
    v_restore = t.restore(v0)
    assert files() == before, "restore must not write data files"
    assert t.snapshot().count() == 10
    # the undone state is still time-travelable pre-vacuum
    assert t.snapshot(v_restore - 1).count() == 5
    assert t.snapshot(v0).count() == 10


def test_restore_after_schema_evolution_relogs_old_schema(spark):
    t = _fresh(spark)
    v0 = t.append(spark.createDataFrame([(1,)], "k int"))
    t.append(
        spark.createDataFrame([(2, "x")], "k int, tag string"),
        evolve_schema=True,
    )
    t.restore(v0)
    assert t.snapshot().columns == ["k"]
    assert t.snapshot().count() == 1


def test_vacuum_drops_only_out_of_horizon_files(spark):
    t = _fresh(spark)
    t.append(spark.createDataFrame([(1,), (2,)], "k int"))
    t.delete_where("k = 1")  # COW rewrite; v0's file now historical
    # with the default grace window, freshly-written files are protected
    # even when unreferenced (in-flight-append safety)
    assert t.vacuum(keep_versions=1) == 0
    # horizon = latest version only, grace waived (stop-the-world
    # maintenance): v0's original file is vacuumable
    removed = t.vacuum(keep_versions=1, grace_seconds=0)
    assert removed >= 1
    assert {r["k"] for r in t.snapshot().collect()} == {2}
    # a wide horizon removes nothing further
    assert t.vacuum(keep_versions=10, grace_seconds=0) == 0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    spans=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=90),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=5,
    ),
    lo=st.integers(min_value=-10, max_value=110),
    width=st.integers(min_value=0, max_value=60),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_scan_where_equals_full_filter(spark, spans, lo, width):
    """Stats skipping must NEVER change results: for any file layout and
    any range, scan_where == full snapshot filtered to the range."""
    t = _fresh(spark)
    for start, n in spans:
        t.append(
            spark.range(start, start + n + 1).selectExpr("id AS k"),
            stats_col="k",
        )
    hi = lo + width
    df, scanned, total = t.scan_where("k", lo, hi)
    got = sorted(r["k"] for r in df.collect())
    want = sorted(
        r["k"]
        for r in t.snapshot()
        .filter(f"k >= {lo} AND k <= {hi}")
        .collect()
    )
    assert got == want
    assert 0 <= scanned <= total == len(spans)


def test_stats_col_date_typed(spark):
    """stats_col on a DATE column must not raise (round-5 ADVICE:
    date.isoformat() takes no sep argument) and must still skip files."""
    t = _fresh(spark)
    t.append(
        spark.sql("SELECT DATE'2024-01-01' AS d UNION ALL SELECT DATE'2024-01-31'"),
        stats_col="d",
    )
    t.append(
        spark.sql("SELECT DATE'2024-06-01' AS d UNION ALL SELECT DATE'2024-06-30'"),
        stats_col="d",
    )
    df, scanned, total = t.scan_where("d", "2024-01-01", "2024-02-15")
    assert total == 2 and scanned == 1
    assert df.count() == 2


def test_scan_where_all_null_stats_file(spark):
    """A file whose stats column is all NULL commits {min: None, max:
    None}; scan_where must conservatively scan it, not raise (round-5
    ADVICE)."""
    t = _fresh(spark)
    t.append(
        spark.sql("SELECT 5 AS k UNION ALL SELECT 15"), stats_col="k"
    )
    t.append(
        spark.sql("SELECT CAST(NULL AS INT) AS k"), stats_col="k"
    )
    df, scanned, total = t.scan_where("k", 0, 10)
    assert total == 2 and scanned == 2  # null-stats file scanned
    assert sorted(r["k"] for r in df.collect()) == [5]


def test_change_feed_reconciles_to_later_schema(spark):
    """A column added between the versions must appear in the feed with
    NULL preimages — insert rows keep the new column's values (round-5
    ADVICE: intersection semantics dropped them)."""
    t = _fresh(spark)
    v0 = t.append(spark.createDataFrame([(1, "a")], "k int, v string"))
    t.append(
        spark.createDataFrame([(2, "b", "new")], "k int, v string, extra string"),
        evolve_schema=True,
    )
    feed = t.change_feed(v0, None, keys=["k"]).collect()
    assert "extra" in t.change_feed(v0, None, keys=["k"]).columns
    ins = [r for r in feed if r["_change_type"] == "insert"]
    assert len(ins) == 1 and ins[0]["extra"] == "new"


def test_restore_noop_without_schema_action(spark):
    """restore() to a version with no file-set delta and no recoverable
    schema must still commit cleanly (round-5 ADVICE: None.jsonValue())."""
    t = _fresh(spark)
    v0 = t.append(spark.createDataFrame([(1,)], "k int"))
    # restore to the current state: no removes/adds, schema unchanged
    v1 = t.restore(v0)
    assert v1 == v0 + 1
    assert t.snapshot().count() == 1


def test_vacuum_grace_protects_uncommitted_files(spark):
    """vacuum must never delete a freshly-written, not-yet-committed
    data file (round-5 ADVICE: append writes files BEFORE committing)."""
    import os

    t = _fresh(spark)
    t.append(spark.createDataFrame([(1,)], "k int"))
    # simulate an in-flight append: data files on disk, no commit yet
    sub = os.path.join(t.base, "data", "inflight00")
    os.makedirs(sub)
    orphan = os.path.join(sub, "part-00000.parquet")
    spark.createDataFrame([(9,)], "k int").toPandas().to_parquet(orphan)
    assert t.vacuum(keep_versions=1) == 0  # grace window protects it
    assert os.path.exists(orphan)
    assert t.vacuum(keep_versions=1, grace_seconds=0) == 1  # waived
