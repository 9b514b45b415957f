"""Property tests for the as-of join kernel (operators/asof.py).

Seven registered ops ride one union+window kernel; a subtle tie-break or
direction bug would poison all of them (round-2 VERDICT task 6). Two
independent references pin the contract on hypothesis-generated data:

- pandas ``merge_asof`` for the knob space pandas speaks (direction
  backward/forward x allow_exact_matches x tolerance) — anchors the
  kernel to the public library's semantics;
- a brute-force per-row reference for the full contract including
  ``carry="first"`` (first-touch) and the documented
  tolerance-on-carried-match rule pandas has no analogue for.

Generated data deliberately includes: ties of left.ts == right.ts
(exactness semantics), keys present on only one side (NULL payload),
empty sides, duplicate left timestamps, and multi-key interleavings.
Right timestamps are deduplicated per key — with two right rows at the
same instant the winning payload is unspecified in every engine
(pandas included), so parity is only well-defined without them.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dataengineeringutils_spark.operators.asof import asof_join

TS = st.integers(min_value=0, max_value=50)
KEY = st.integers(min_value=0, max_value=3)

left_rows = st.lists(st.tuples(KEY, TS), min_size=0, max_size=12)
right_rows = st.lists(st.tuples(KEY, TS), min_size=0, max_size=12)


def _brute(left, right, direction, strict, tolerance, carry):
    """Per-row reference of the kernel's documented contract."""
    out = []
    for k, lts in left:
        if direction == "backward":
            cands = [
                (rts, v)
                for rk, rts, v in right
                if rk == k and (rts < lts if strict else rts <= lts)
            ]
            pick = (
                max(cands) if carry == "last" else min(cands)
            ) if cands else None
            gap = (lts - pick[0]) if pick else None
        else:
            cands = [
                (rts, v)
                for rk, rts, v in right
                if rk == k and (rts > lts if strict else rts >= lts)
            ]
            # forward sorts ts DESC, so the running "last" carry ends on
            # the SMALLEST in-range ts (nearest), "first" on the largest
            pick = (
                min(cands) if carry == "last" else max(cands)
            ) if cands else None
            gap = (pick[0] - lts) if pick else None
        if pick is not None and tolerance is not None and gap > tolerance:
            pick = None
        out.append((k, lts, pick[1] if pick else None))
    out.sort(key=lambda t: (t[0], t[1], t[2] is None, t[2]))
    return out


def _spark_asof(spark, left, right, **kw):
    lschema = "k int, lts int"
    rschema = "k int, rts int, quote int"
    ldf = spark.createDataFrame(left or [], schema=lschema)
    rdf = spark.createDataFrame(right or [], schema=rschema)
    got = asof_join(
        ldf, rdf, by="k", left_ts="lts", right_ts="rts", payload=["quote"], **kw
    ).select("k", "lts", F.col("asof_quote").alias("q"))
    rows = [(r["k"], r["lts"], r["q"]) for r in got.collect()]
    rows.sort(key=lambda t: (t[0], t[1], t[2] is None, t[2] or 0))
    return rows


@given(left=left_rows, right=right_rows)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_asof_matches_pandas_and_brute(spark, left, right):
    # unique right ts per key (see module docstring); payload = a value
    # derived from (key, ts) so a wrong pick is visible, not coincidental
    seen = set()
    right_u = []
    for k, ts in right:
        if (k, ts) not in seen:
            seen.add((k, ts))
            right_u.append((k, ts, k * 1000 + ts))
    lpdf = pd.DataFrame(left, columns=["k", "lts"]).sort_values("lts")
    rpdf = pd.DataFrame(right_u, columns=["k", "rts", "quote"]).sort_values("rts")

    for direction in ("backward", "forward"):
        for strict in (False, True):
            for tol in (None, 5):
                got = _spark_asof(
                    spark,
                    left,
                    right_u,
                    direction=direction,
                    strict=strict,
                    tolerance=None if tol is None else F.lit(tol),
                )
                want = _brute(
                    left, right_u, direction, strict, tol, carry="last"
                )
                want = sorted(
                    want, key=lambda t: (t[0], t[1], t[2] is None, t[2] or 0)
                )
                assert got == want, (direction, strict, tol)
                # anchor to pandas for the knobs it supports
                if len(lpdf) and len(rpdf):
                    pj = pd.merge_asof(
                        lpdf,
                        rpdf,
                        left_on="lts",
                        right_on="rts",
                        by="k",
                        direction=direction,
                        allow_exact_matches=not strict,
                        tolerance=tol,
                    )
                    prows = sorted(
                        (
                            (int(r.k), int(r.lts), None if pd.isna(r.quote) else int(r.quote))
                            for r in pj.itertuples()
                        ),
                        key=lambda t: (t[0], t[1], t[2] is None, t[2] or 0),
                    )
                    assert got == prows, ("pandas", direction, strict, tol)


@given(left=left_rows, right=right_rows)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_asof_first_touch_carry(spark, left, right):
    seen = set()
    right_u = []
    for k, ts in right:
        if (k, ts) not in seen:
            seen.add((k, ts))
            right_u.append((k, ts, k * 1000 + ts))
    for direction in ("backward", "forward"):
        got = _spark_asof(
            spark, left, right_u, direction=direction, carry="first"
        )
        want = sorted(
            _brute(left, right_u, direction, False, None, carry="first"),
            key=lambda t: (t[0], t[1], t[2] is None, t[2] or 0),
        )
        assert got == want, direction


def test_asof_empty_sides(spark):
    assert _spark_asof(spark, [], [(0, 1, 7)]) == []
    assert _spark_asof(spark, [(0, 1)], []) == [(0, 1, None)]


def test_asof_equal_ts_inclusive_vs_strict(spark):
    left = [(0, 10)]
    right = [(0, 10, 42), (0, 5, 41)]
    assert _spark_asof(spark, left, right, strict=False) == [(0, 10, 42)]
    assert _spark_asof(spark, left, right, strict=True) == [(0, 10, 41)]
    assert _spark_asof(
        spark, left, right, strict=True, tolerance=F.lit(3)
    ) == [(0, 10, None)]


def _spark_nearest(spark, left_ided, right_u):
    """The join_asof_nearest composition (backward + forward pass, gap
    compare, exact ties prefer backward) on test data."""
    from dataengineeringutils_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(left_ided or [], "rid int, k int, lts int")
    rdf = spark.createDataFrame(
        [(k, ts, ts, v) for k, ts, v in (right_u or [])],
        "k int, rts int, rts_p int, quote int",
    )
    b = asof_join(
        ldf, rdf, by="k", left_ts="lts", right_ts="rts",
        payload=["rts_p", "quote"], payload_prefix="b_",
    ).select("rid", "k", "lts", "b_rts_p", "b_quote")
    f = asof_join(
        ldf, rdf, by="k", left_ts="lts", right_ts="rts",
        payload=["rts_p", "quote"], payload_prefix="f_", direction="forward",
    ).select("rid", "f_rts_p", "f_quote")
    j = b.join(f, "rid")
    take_back = F.when(F.col("f_rts_p").isNull(), True).otherwise(
        F.when(F.col("b_rts_p").isNull(), False).otherwise(
            (F.col("lts") - F.col("b_rts_p"))
            <= (F.col("f_rts_p") - F.col("lts"))
        )
    )
    got = j.select(
        "k",
        "lts",
        F.when(take_back, F.col("b_quote"))
        .otherwise(F.col("f_quote"))
        .alias("q"),
    )
    rows = [(r["k"], r["lts"], r["q"]) for r in got.collect()]
    rows.sort(key=lambda t: (t[0], t[1], t[2] is None, t[2] or 0))
    return rows


def _brute_nearest(left, right_u):
    out = []
    for k, lts in left:
        cands = [
            (abs(rts - lts), 0 if rts <= lts else 1, rts, v)
            for rk, rts, v in right_u
            if rk == k
        ]
        pick = min(cands) if cands else None
        out.append((k, lts, pick[3] if pick else None))
    out.sort(key=lambda t: (t[0], t[1], t[2] is None, t[2] or 0))
    return out


@given(left=left_rows, right=right_rows)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_asof_nearest_matches_pandas_and_brute(spark, left, right):
    """Completes the four-mode coverage (round-3 VERDICT item 8):
    NEAREST = min absolute gap, exact ties prefer backward — checked
    against a per-row reference and pandas merge_asof('nearest')."""
    seen = set()
    right_u = []
    for k, ts in right:
        if (k, ts) not in seen:
            seen.add((k, ts))
            right_u.append((k, ts, k * 1000 + ts))
    left_ided = [(i, k, ts) for i, (k, ts) in enumerate(left)]
    got = _spark_nearest(spark, left_ided, right_u)
    assert got == _brute_nearest(left, right_u)
    if left and right_u:
        lpdf = pd.DataFrame(left, columns=["k", "lts"]).sort_values("lts")
        rpdf = pd.DataFrame(
            right_u, columns=["k", "rts", "quote"]
        ).sort_values("rts")
        pj = pd.merge_asof(
            lpdf, rpdf, left_on="lts", right_on="rts", by="k",
            direction="nearest",
        )
        prows = sorted(
            (
                (int(r.k), int(r.lts), None if pd.isna(r.quote) else int(r.quote))
                for r in pj.itertuples()
            ),
            key=lambda t: (t[0], t[1], t[2] is None, t[2] or 0),
        )
        assert got == prows
