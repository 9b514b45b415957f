"""Model-based property test of the LogTable lifecycle: a random
interleaving of append / delete_where / merge / compact must always
agree with a driver-side dict model, and time travel must replay any
earlier state exactly. This pins the interaction semantics (e.g. a
merge after a delete after an evolve) that example-based tests can't
enumerate."""

from __future__ import annotations

import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataengineeringutils_spark.paths import scratch_dir
from dataengineeringutils_spark.txnlog import LogTable

KEYS = st.integers(min_value=0, max_value=19)
VALS = st.integers(min_value=-5, max_value=5)

# an operation is one of:
#   ("append", [(k, v), ...])      blind append (duplicate keys allowed)
#   ("delete", threshold)          DELETE WHERE v > threshold
#   ("merge", [(k, v), ...])       upsert by k (source key-unique)
#   ("compact",)                   rewrite live files
ops_strategy = st.lists(
    st.one_of(
        st.tuples(
            st.just("append"),
            st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=4),
        ),
        st.tuples(st.just("delete"), VALS),
        st.tuples(
            st.just("merge"),
            st.lists(
                st.tuples(KEYS, VALS),
                min_size=1,
                max_size=4,
                unique_by=lambda t: t[0],
            ),
        ),
        st.tuples(st.just("compact")),
        # ("restore", k): roll back to the k-th recorded version (mod len)
        st.tuples(st.just("restore"), st.integers(min_value=0, max_value=5)),
    ),
    min_size=1,
    max_size=6,
)


def _snapshot_set(t: LogTable, version=None):
    return sorted(
        (r["k"], r["v"]) for r in t.snapshot(version).collect()
    )


@given(ops=ops_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_logtable_agrees_with_model(spark, ops):
    t = LogTable(spark, scratch_dir("txnprop_" + uuid.uuid4().hex))
    # model: list of (k, v) rows — appends may duplicate keys; merge
    # replaces ALL rows of a matched key with the single source row
    model: list[tuple[int, int]] = []
    history: list[tuple[int, list[tuple[int, int]]]] = []
    for op in ops:
        if op[0] == "append":
            rows = op[1]
            v = t.append(
                spark.createDataFrame(rows, "k int, v int"), n_files=2
            )
            model = model + rows
        elif op[0] == "delete":
            if not model and not history:
                continue  # delete on an empty table raises by contract
            thr = op[1]
            try:
                v = t.delete_where(f"v > {thr}")
            except ValueError:
                assert not t.live_files()
                continue
            model = [(k, x) for (k, x) in model if not (x > thr)]
        elif op[0] == "merge":
            rows = op[1]
            v = t.merge(
                spark.createDataFrame(rows, "k int, v int"), keys=["k"]
            )
            src = dict(rows)
            model = [(k, x) for (k, x) in model if k not in src] + rows
        elif op[0] == "compact":
            if not history:
                continue  # compacting an empty table raises by contract
            v = t.compact(n_files=1)
        else:  # restore
            if not history:
                continue
            v_target, state = history[op[1] % len(history)]
            v = t.restore(v_target)
            model = list(state)
        history.append((v, sorted(model)))
        assert _snapshot_set(t) == sorted(model), op
    # time travel: every recorded version replays its state exactly
    for v, state in history:
        assert _snapshot_set(t, v) == state, f"version {v}"


@pytest.mark.parametrize("evolve", [False, True])
def test_merge_after_evolution_preserves_null_fill(spark, evolve):
    """merge on an evolved table must keep NULL-filled rows intact
    unless their key matches (the delete_where NULL bug's merge
    sibling)."""
    t = LogTable(spark, scratch_dir("txnprop_ev_" + uuid.uuid4().hex))
    t.append(spark.createDataFrame([(1,), (2,)], "k int"))
    t.append(
        spark.createDataFrame([(3, "x")], "k int, tag string"),
        evolve_schema=True,
    )
    src = spark.createDataFrame([(2, "up"), (9, "new")], "k int, tag string")
    if evolve:
        t.merge(src, keys=["k"])
        got = {(r["k"], r["tag"]) for r in t.snapshot().collect()}
        assert got == {(1, None), (2, "up"), (3, "x"), (9, "new")}
    else:
        t.merge(src, keys=["k"])
        assert t.snapshot().count() == 4


@given(ops=ops_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_change_feed_reconstructs_snapshots(spark, ops):
    """Algebraic contract of the CDF: for any version pair on a
    key-unique table, (snapshot(v0) − deletes − preimages) ∪ inserts ∪
    postimages == snapshot(v1). Appends are funneled through merge to
    keep keys unique (the change-feed precondition, as in Delta)."""
    t = LogTable(spark, scratch_dir("txncdf_" + uuid.uuid4().hex))
    versions = []
    for op in ops:
        if op[0] in ("append", "merge"):
            rows = list({k: (k, v) for k, v in op[1]}.values())
            versions.append(
                t.merge(
                    spark.createDataFrame(rows, "k int, v int"), keys=["k"]
                )
            )
        elif op[0] == "delete":
            if not versions:
                continue
            try:
                versions.append(t.delete_where(f"v > {op[1]}"))
            except ValueError:
                continue
        else:
            if not versions:
                continue
            versions.append(t.compact(n_files=1))
    if len(versions) < 2:
        return
    v0, v1 = versions[0], versions[-1]
    start = {(r["k"], r["v"]) for r in t.snapshot(v0).collect()}
    end = {(r["k"], r["v"]) for r in t.snapshot(v1).collect()}
    removed, added = set(), set()
    for r in t.change_feed(v0, v1, keys=["k"]).collect():
        row = (r["k"], r["v"])
        if r["_change_type"] in ("delete", "update_preimage"):
            removed.add(row)
        else:
            added.add(row)
    assert removed <= start, "removed rows must exist in the old snapshot"
    assert (start - removed) | added == end


# --- crash consistency (round-5 VERDICT #5) -------------------------------
# A writer can die at two points: AFTER writing data files but BEFORE the
# log commit (append's documented write-then-commit order), or mid-commit
# with the .tmp log dotfile written but never linked. Readers replay only
# committed NNNNNNNN.json entries, so neither partial state may ever be
# visible, and a retry of the same logical append must converge.

crash_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("append"),
            st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=3),
        ),
        st.tuples(
            st.just("crash_data"),  # dies after _write_files, no commit
            st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=3),
        ),
        st.tuples(st.just("crash_tmp")),  # dies mid-_commit: orphan .tmp
    ),
    min_size=2,
    max_size=6,
)


@given(ops=crash_ops)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_torn_writers_never_visible_and_retry_converges(spark, ops):
    import json
    import os
    import uuid as _uuid

    t = LogTable(spark, scratch_dir("txn_crash_" + _uuid.uuid4().hex))
    model: list[tuple[int, int]] = []

    def mk(rows):
        return spark.createDataFrame(rows, "k int, v int")

    for op in ops:
        if op[0] == "append":
            t.append(mk(op[1]))
            model.extend(op[1])
        elif op[0] == "crash_data":
            # the torn writer: data files hit disk, commit never happens
            torn_actions = t._write_files(mk(op[1]), n_files=1)
            assert torn_actions  # files really were written
            # ... process dies here; the RETRY is a fresh full append
            t.append(mk(op[1]))
            model.extend(op[1])
        else:  # crash_tmp: commit died between tmp write and os.link
            orphan = os.path.join(t.log_dir, f".{_uuid.uuid4().hex}.tmp")
            with open(orphan, "w") as f:
                f.write(json.dumps({"add": {"path": "data/bogus/x.parquet"}}) + "\n")
        # INVARIANT after every step: readers see exactly the committed
        # rows — torn data files and orphan .tmp log entries are invisible
        if model:
            got = sorted((r["k"], r["v"]) for r in t.snapshot().collect())
            assert got == sorted(model)
    # vacuum (stop-the-world) clears torn writers' data orphans without
    # touching any committed file; the snapshot is unchanged
    t.vacuum(keep_versions=10_000, grace_seconds=0)
    if model:
        got = sorted((r["k"], r["v"]) for r in t.snapshot().collect())
        assert got == sorted(model)
