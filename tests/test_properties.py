"""Property-based layer (SURVEY §5.2): conformance casts, set ops, as-of.

Hypothesis generates the data; each property runs one small Spark job, so
example counts are deliberately low (the smoke/oracle tiers carry volume).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dataengineeringutils_spark.meta import (
    ColumnMeta,
    TableMeta,
    conform,
    conformance_report,
    conforms,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

META = TableMeta(
    name="t",
    columns=[
        ColumnMeta("k", "long"),
        ColumnMeta("v", "double"),
        ColumnMeta("s", "character"),
    ],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-(2**31), max_value=2**31),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.text(alphabet="abc xyz0189", max_size=8),
    ),
    min_size=1,
    max_size=20,
)


@given(rows=rows_strategy)
@SETTINGS
def test_conform_idempotent_and_conforms(spark, rows):
    # out-of-order, wider-typed source frame (extra column must be dropped)
    df = spark.createDataFrame(
        [(s, float(v), int(k), "extra") for k, v, s in rows],
        "s string, v double, k bigint, junk string",
    )
    out = conform(df, META)
    assert conforms(out, META)
    assert out.columns == ["k", "v", "s"]
    # idempotence: conforming a conformed frame is a no-op
    again = conform(out, META)
    assert again.schema == out.schema
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))


@given(rows=st.lists(st.text(alphabet="0123456789ax", min_size=1, max_size=5), min_size=1, max_size=15))
@SETTINGS
def test_conformance_report_counts_uncastable(spark, rows):
    meta = TableMeta(name="t", columns=[ColumnMeta("s", "int")])
    df = spark.createDataFrame([(r,) for r in rows], "s string")
    expected = sum(1 for r in rows if not _int_castable(r))
    got = conformance_report(df, meta).collect()[0]["s_cast_failures"]
    assert got == expected


def _int_castable(s: str) -> bool:
    try:
        int(s)
        return True
    except ValueError:
        return False


@given(
    xs=st.lists(st.integers(min_value=0, max_value=30), max_size=25),
    ys=st.lists(st.integers(min_value=0, max_value=30), max_size=25),
)
@SETTINGS
def test_set_ops_match_python_sets(spark, xs, ys):
    a = spark.createDataFrame([(x,) for x in xs], "v int") if xs else spark.range(0).select(F.col("id").cast("int").alias("v"))
    b = spark.createDataFrame([(y,) for y in ys], "v int") if ys else spark.range(0).select(F.col("id").cast("int").alias("v"))
    got_i = sorted(r["v"] for r in a.intersect(b).collect())
    got_e = sorted(r["v"] for r in a.exceptAll(b).collect())
    assert got_i == sorted(set(xs) & set(ys))
    # exceptAll = multiset difference
    from collections import Counter

    assert sorted((Counter(xs) - Counter(ys)).elements()) == got_e


@given(
    lefts=st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=12),
    rights=st.lists(
        st.tuples(st.integers(min_value=0, max_value=100), st.integers(min_value=0, max_value=9)),
        max_size=12,
    ),
)
@SETTINGS
def test_asof_join_matches_reference_impl(spark, lefts, rights):
    from dataengineeringutils_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, t) for t in lefts], "k int, ts bigint")
    right = (
        spark.createDataFrame([(1, t, p) for t, p in rights], "k int, ts bigint, pay int")
        if rights
        else spark.createDataFrame([], "k int, ts bigint, pay int")
    )
    out = asof_join(
        left, right, by="k", left_ts="ts", right_ts="ts", payload=["pay"]
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["ts"], []).append(r["asof_pay"])
    for t in lefts:
        # reference semantics: payload of the max right ts <= t; the
        # union+window carries the LAST right row on right-ts ties
        cands = [(rt, p) for rt, p in rights if rt <= t]
        expect = max(cands, key=lambda x: (x[0], _idx(rights, x)))[1] if cands else None
        assert expect in got[t] if cands else all(v is None for v in got[t])


def _idx(rights, x):
    return max(i for i, r in enumerate(rights) if r == x)


@given(
    actions=st.lists(
        st.one_of(
            st.tuples(st.just("append"), st.integers(min_value=1, max_value=12)),
            st.tuples(st.just("compact"), st.just(0)),
        ),
        min_size=1,
        max_size=6,
    )
)
@SETTINGS
def test_logtable_invariants_under_random_commits(spark, tmp_path_factory, actions):
    """LogTable (txnlog.py): for ANY interleaving of appends and
    compactions — (1) the latest snapshot holds exactly the union of all
    appended rows, (2) every historical version replays to the row count
    that was current when it committed, (3) compaction never changes
    content, only the live file set."""
    import uuid

    from dataengineeringutils_spark.txnlog import LogTable

    t = LogTable(spark, str(tmp_path_factory.mktemp("lt") / uuid.uuid4().hex))
    expected_after: list[int] = []  # row count current at each version
    total = 0
    next_id = 0
    did_commit = False
    for kind, n in actions:
        if kind == "append":
            df = spark.range(next_id, next_id + n).withColumnRenamed("id", "k")
            next_id += n
            t.append(df)
            total += n
            expected_after.append(total)
            did_commit = True
        elif did_commit:
            before = {r["k"] for r in t.snapshot().collect()}
            t.compact(n_files=1)
            assert {r["k"] for r in t.snapshot().collect()} == before
            assert len(t.live_files()) == 1
            expected_after.append(total)
    if did_commit:
        assert t.snapshot().count() == total
        for v, want in enumerate(expected_after):
            assert t.snapshot(v).count() == want, (v, want)


@given(
    docs=st.lists(
        st.lists(
            st.integers(min_value=-(2**62), max_value=2**62),
            min_size=1,
            max_size=30,
        ),
        min_size=1,
        max_size=6,
    )
)
@SETTINGS
def test_oph_signatures_dense_and_set_determined(spark, docs):
    """One-permutation MinHash (dedup.minhash_signatures): every
    signature is fully densified (64 non-null slots) for any non-empty
    shingle set, and the signature is a pure function of the SET —
    duplicate rows and row order cannot change it."""
    from dataengineeringutils_spark.operators.dedup import minhash_signatures

    rows = [(i, s) for i, d in enumerate(docs) for s in d]
    df = spark.createDataFrame(rows, "doc_id long, s long")
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(df).collect()}
    assert set(sigs) == set(range(len(docs)))
    for sig in sigs.values():
        assert len(sig) == 64 and all(x is not None for x in sig)
    # permuted + duplicated input -> identical signatures
    rows2 = [(i, s) for i, d in enumerate(docs) for s in (list(reversed(d)) + d)]
    df2 = spark.createDataFrame(rows2, "doc_id long, s long")
    sigs2 = {r["doc_id"]: r["sig"] for r in minhash_signatures(df2).collect()}
    assert sigs == sigs2
