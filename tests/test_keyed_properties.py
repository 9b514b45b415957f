"""Model-based property test of the KeyedTable upsert lifecycle: random
interleavings of upsert/compact must agree with a driver-side
latest-wins model at every step, and every version must replay exactly.
The winner rule (max order_by per key; later-upserted row wins ties) is
the contract every CDC consumer of this layer depends on."""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataengineeringutils_spark.keyed import KeyedTable
from dataengineeringutils_spark.paths import scratch_dir

KEYS = st.integers(min_value=0, max_value=9)
ORDS = st.integers(min_value=0, max_value=5)

ops_strategy = st.lists(
    st.one_of(
        st.tuples(
            st.just("upsert"),
            st.lists(
                st.tuples(KEYS, ORDS, st.integers(0, 99)),
                min_size=1,
                max_size=4,
                # one row per (key, ord) within a batch: two rows of a
                # batch tied on the full ordering have no defined winner
                unique_by=lambda t: (t[0], t[1]),
            ),
        ),
        st.tuples(st.just("compact")),
    ),
    min_size=1,
    max_size=5,
)


@given(ops=ops_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_keyed_table_agrees_with_model(spark, ops):
    t = KeyedTable(
        spark,
        scratch_dir("keyedprop_" + uuid.uuid4().hex),
        keys=["k"],
        order_by=["o"],
    )
    # model[k] = (o, v) with the highest o; a LATER upsert at an equal o
    # replaces (the upsert folds the new batch over the current snapshot,
    # and row_number ties resolve to the incoming batch's row because
    # ordering is total per (k, o) within the union of snapshot+batch
    # only when o strictly increases — so the strategy keeps o unique per
    # key per batch and the model takes >=)
    model: dict[int, tuple[int, int]] = {}
    history = []
    for op in ops:
        if op[0] == "upsert":
            rows = op[1]
            t.upsert(spark.createDataFrame(rows, "k int, o int, v int"))
            for k, o, v in rows:
                if k not in model or o >= model[k][0]:
                    model[k] = (o, v)
        else:
            if t._version < 0:
                continue
            t.compact(target_rows_per_file=4)
        history.append((t._version, dict(model)))
        got = {
            r["k"]: (r["o"], r["v"]) for r in t.current().collect()
        }
        assert got == model, op
    for v, state in history:
        got = {
            r["k"]: (r["o"], r["v"]) for r in t.at_version(v).collect()
        }
        assert got == state, f"version {v}"
