"""The bucketed co-located join must plan without a shuffle (no Exchange
on either join side) and without re-sorting the pre-sorted buckets."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from dataengineeringutils_spark.sources.sinks import write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li_b, o_b = write_bucketed(spark, sf_dir)
    # at fixture scale the planner would (correctly) broadcast instead;
    # disable it to expose the plan shape that matters at 100 TB
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        # result sanity: every lineitem matches exactly one order
        assert j.count() == li_b.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
