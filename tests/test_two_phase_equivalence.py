"""The stats-driven plan switch (windows.TWO_PHASE_MIN_ROWS) must never
change ANSWERS: for every op converted by the round-7 low-cardinality-
window audit, the direct-window small path and the bucketed two-phase
path are run on the same fixture and compared cell-exactly. The oracle
gate checks whichever path the fixture size selects; this test pins the
OTHER path against it.
"""

from __future__ import annotations

import pytest

import dataengineeringutils_spark.operators.windows as W
from dataengineeringutils_spark.registry import queries

CONVERTED = [
    "agg_percentile_disc",
    "dq_outlier_iqr_fences",
    "dq_fanout_profile",
    "events_value_qq_table",
    "interval_max_concurrent",
    "dataset_interleave_shards",
    "text_pack_sequences",
    "win_range_frame",
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


@pytest.mark.parametrize("name", CONVERTED)
def test_two_phase_equals_direct(spark, sf_dir, name, monkeypatch):
    fn = queries()[name]
    monkeypatch.setattr(W, "TWO_PHASE_MIN_ROWS", 10**12)
    direct = _rows(fn(spark, sf_dir))
    monkeypatch.setattr(W, "TWO_PHASE_MIN_ROWS", 0)
    two_phase = _rows(fn(spark, sf_dir))
    assert direct == two_phase, (
        f"{name}: two-phase path diverges from direct path "
        f"(first direct={direct[:2]}, first two_phase={two_phase[:2]})"
    )
