"""Scale-plan pins for the size-gated scan spread (round-11 VERDICT
items 1 and 8).

The seven heavily-reducing lineitem aggregates (plus the un-gamed
``customer_supplier_switching``) spread the single-split fixture scan by
a key so the per-row DECIMAL math parallelizes locally. That spread must
be a LOCAL-ONLY device: with the gate forced off (the production-scale
configuration — ``SPARK_GRAFT_SPREAD_MAX_BYTES=0``), the physical plan
must show NO fact-scale exchange keyed on the spread key before the
partial aggregate; the only exchanges left are the aggregate's own
|groups|-row shuffles (and broadcast builds). With the gate on (the
fixture default), the spread must actually fire, or the local bench
shape silently regresses to the 1-task serial scan.
"""

from __future__ import annotations

import contextlib
import io

from dataengineeringutils_spark.registry import queries

# op -> the key(s) its gated spread uses; none may appear as an
# Exchange hashpartitioning key in the gate-off (at-scale) plan
SPREAD_OPS = {
    "agg_group_sums": ("l_orderkey",),
    "agg_decimal_exact": ("l_orderkey",),
    "agg_weighted_avg": ("l_orderkey",),
    "lineitem_margin_waterfall": ("l_orderkey",),
    "lineitem_discount_response": ("l_orderkey",),
    "lineitem_discount_depth_mix": ("l_orderkey",),
    "supplier_price_index": ("l_suppkey",),
    "customer_supplier_switching": ("l_orderkey",),
}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_no_fact_exchange_before_reducing_agg_at_scale(
    spark, sf_dir, monkeypatch
):
    monkeypatch.setenv("SPARK_GRAFT_SPREAD_MAX_BYTES", "0")
    for name, keys in SPREAD_OPS.items():
        plan = _plan(queries()[name](spark, sf_dir))
        for k in keys:
            assert f"hashpartitioning({k}" not in plan, (name, plan)
        # the reducing aggregate still does its map-side partial pass
        # directly over the scan (no exchange in between)
        assert "partial_" in plan, (name, plan)


def test_gated_spread_fires_on_fixture_scale(spark, sf_dir, monkeypatch):
    # fixture tables are far below one scan split: the spread must plan
    monkeypatch.delenv("SPARK_GRAFT_SPREAD_MAX_BYTES", raising=False)
    plan = _plan(queries()["agg_group_sums"](spark, sf_dir))
    assert "hashpartitioning(l_orderkey" in plan, plan
