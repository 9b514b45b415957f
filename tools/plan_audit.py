"""Physical-plan audit: one line per declared query, no execution.

Usage: python tools/plan_audit.py [name ...]

For every declared query (or the named subset), builds the DataFrame at
$SPARK_GRAFT_SF_DIR (default sf0.01) and summarizes its physical plan:

  name  scans=N exch=N bcast=N smj=N py=[nodes]

- scans: parquet/orc scans (how many times the lake is read)
- exch:  Exchange nodes (shuffles — the scale currency)
- bcast: broadcast joins/exchanges (dimension-side hygiene)
- smj:   sort-merge joins (each implies two sorted shuffles)
- py:    Python-crossing nodes (should be empty outside udf/multimodal/
         similarity kernels — anything else is a hot-path regression)

Codegen coverage is NOT reported: under AQE, codegen ids are assigned
only when a stage actually executes, so a plan-only audit would read 0.

Streaming ops are skipped (their plan exists only inside a running query).
The audit is plan-only: nothing executes, so it is safe to run anywhere.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dataengineeringutils_spark.registry import queries  # noqa: E402
from dataengineeringutils_spark.session import get_spark  # noqa: E402

# Ops whose construction EXECUTES Spark jobs (streaming harnesses, sinks
# that write before reading back, iterative ops that persist): plan-audit
# would run real work, so they are listed, not planned.
_EXECUTES_ON_BUILD = {
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_watermark_late", "stream_dedup_state", "stream_stateful_counter",
    "stream_static_join", "stream_upsert_latest", "stream_stream_join",
    "sink_csv_roundtrip", "sink_jsonl_roundtrip", "sink_bucketed_join",
    "sink_partitioned_parquet", "sink_orc_roundtrip", "scan_schema_evolution",
    "pipeline_clean_corpus",
}

_PY_NODES = (
    "BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow",
    "FlatMapGroupsInPandas", "FlatMapGroupsInPandasWithState", "PythonUDTF",
)


def audit_one(name: str, fn, spark, sf_dir: str) -> str:
    if name in _EXECUTES_ON_BUILD:
        return f"{name:32s} (executes on build — skipped)"
    df = fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    tree = plan.split("\n\n")[0]
    py = sorted({n for n in _PY_NODES if n in tree})
    n_scans = len(re.findall(r"Scan (?:parquet|orc)", tree))
    return (
        f"{name:32s} scans={n_scans}"
        f" exch={tree.count('Exchange')}"
        f" bcast={tree.count('Broadcast')}"
        f" smj={tree.count('SortMergeJoin')}"
        f" py={py if py else '[]'}"
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("plan_audit")
    qs = queries()
    names = sys.argv[1:] or sorted(qs)
    for name in names:
        try:
            print(audit_one(name, qs[name], spark, sf_dir), flush=True)
        except Exception as exc:  # pragma: no cover - diagnostic tool
            print(f"{name:32s} ERROR {type(exc).__name__}: {exc}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
