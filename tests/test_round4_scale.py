"""Round-4 scale fixes: fixed-size md5-ranked probe panels (the eval
ops' query sets must be bounded by construction, not corpus-
proportional) and engine parity of the panel definition."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from dataengineeringutils_spark.operators.similarity import (
    BLOCK_TOPK_PANEL_K,
    KNN_EVAL_PANEL_K,
    SIGNQ_PANEL_K,
    collect_panel,
    probe_panel,
)
from dataengineeringutils_spark.tables import table

SF = "/root/testdata/sf0.01"


def test_probe_panel_matches_python_md5_rank(spark):
    """Spark's md5-ranked panel == a pure-Python model == (by the
    fixture check in verify_local) DuckDB's — the portability the
    oracles rely on."""
    e = table(spark, SF, "embeddings")
    got = [r["vec_id"] for r in probe_panel(e, 12).collect()]
    ids = [r["vec_id"] for r in e.select("vec_id").collect()]
    want = sorted(
        ids, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:12]
    assert got == want


def test_probe_panel_is_fixed_size(spark):
    """Panel size is K regardless of corpus size — the round-3 scale
    bug was a modulo stride growing linearly with the corpus."""
    e = table(spark, SF, "embeddings")
    for k in (BLOCK_TOPK_PANEL_K, KNN_EVAL_PANEL_K, SIGNQ_PANEL_K):
        assert probe_panel(e, k).count() == k
        q_ids, q_mat = collect_panel(e, k)
        assert len(q_ids) == k and q_mat.shape[0] == k
        # ids come back sorted so executor-side repeat/reshape is stable
        assert list(q_ids) == sorted(q_ids)


def test_probe_panel_plan_is_take_ordered(spark):
    """The panel must compile to a TakeOrderedAndProject (per-partition
    top-K, K rows to the driver) — not a global sort of the corpus."""
    e = table(spark, SF, "embeddings")
    plan = probe_panel(e, 16)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_gram_two_phase_matches_driver_merge(spark):
    """The cluster-side groupBy(i,j) pre-reduction (the 100x path) must
    be bit-identical to the driver merge (the local fast path)."""
    from dataengineeringutils_spark.operators.similarity import (
        _compute_gram_fixed,
    )

    a = _compute_gram_fixed(spark, SF, two_phase=False)
    b = _compute_gram_fixed(spark, SF, two_phase=True)
    assert a == b
