"""Streaming differential fuzz sweep: N seeded windowed-aggregation
cases, each run as a REAL Structured Streaming job AND a batch plan AND
a DuckDB oracle (see dataengineeringutils_spark/streamfuzz.py).

Usage: python tools/stream_fuzz_sweep.py [--n 500] [--sf-dir DIR] [--json OUT]

Writes a summary artifact (default STREAMFUZZ.json). The pytest gate
(tests/test_stream_fuzz.py) runs the first seeds of the same sequence;
this tool is the deep version for round evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dataengineeringutils_spark.session import get_spark  # noqa: E402
from dataengineeringutils_spark.streamfuzz import (  # noqa: E402
    run_foreachbatch_case,
    run_recovery_case,
    run_stateful_case,
    run_stream_case,
)
from tools.verify_local import duck_connect  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument(
        "--n-stateful",
        type=int,
        default=300,
        help="seeds for the stateful families (stream-stream interval "
        "join + dropDuplicatesWithinWatermark; round-9 width)",
    )
    ap.add_argument(
        "--n-foreachbatch",
        type=int,
        default=100,
        help="seeds for the foreachBatch sink families (KeyedTable "
        "MERGE-upsert + txn-idempotent LogTable append, with injected "
        "crash-window replays; round-10 width)",
    )
    ap.add_argument(
        "--n-recovery",
        type=int,
        default=100,
        help="seeds for the checkpoint-recovery family (stop/restart "
        "from checkpoint with seeded unclean kills; round-11 width)",
    )
    ap.add_argument("--sf-dir", default=os.environ.get(
        "FUZZ_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--json", default=os.path.join(REPO, "STREAMFUZZ.json"))
    args = ap.parse_args()

    spark = get_spark("stream-fuzz-sweep")
    con = duck_connect(args.sf_dir)
    t0 = time.time()
    shape_counts: dict[str, int] = {}
    failures = []
    for seed in range(1, args.n + 1):
        r = run_stream_case(spark, con, args.sf_dir, seed)
        shape_counts[r["shape"]] = shape_counts.get(r["shape"], 0) + 1
        if not r["ok"]:
            failures.append(r)
            print(f"DIVERGE seed={seed}: {r['issues'][:2]}")
        if seed % 50 == 0:
            print(f"... {seed}/{args.n} ({time.time() - t0:.0f}s, "
                  f"{len(failures)} divergent)", flush=True)
    for seed in range(1, args.n_stateful + 1):
        r = run_stateful_case(spark, con, args.sf_dir, seed)
        shape_counts[r["shape"]] = shape_counts.get(r["shape"], 0) + 1
        if not r["ok"]:
            failures.append(r)
            print(f"DIVERGE stateful seed={seed}: {r['issues'][:2]}")
        if seed % 50 == 0:
            print(f"... stateful {seed}/{args.n_stateful} "
                  f"({time.time() - t0:.0f}s, "
                  f"{len(failures)} divergent)", flush=True)
    for seed in range(1, args.n_foreachbatch + 1):
        r = run_foreachbatch_case(spark, con, args.sf_dir, seed)
        shape_counts[r["shape"]] = shape_counts.get(r["shape"], 0) + 1
        if not r["ok"]:
            failures.append(r)
            print(f"DIVERGE foreachbatch seed={seed}: {r['issues'][:2]}")
        if seed % 50 == 0:
            print(f"... foreachbatch {seed}/{args.n_foreachbatch} "
                  f"({time.time() - t0:.0f}s, "
                  f"{len(failures)} divergent)", flush=True)
    for seed in range(1, args.n_recovery + 1):
        r = run_recovery_case(spark, con, args.sf_dir, seed)
        shape_counts[r["shape"]] = shape_counts.get(r["shape"], 0) + 1
        if not r["ok"]:
            failures.append(r)
            print(f"DIVERGE recovery seed={seed}: {r['issues'][:2]}")
        if seed % 50 == 0:
            print(f"... recovery {seed}/{args.n_recovery} "
                  f"({time.time() - t0:.0f}s, "
                  f"{len(failures)} divergent)", flush=True)
    out = {
        "n_seeds": args.n + args.n_stateful + args.n_foreachbatch
        + args.n_recovery,
        "n_seeds_agg": args.n,
        "n_seeds_stateful": args.n_stateful,
        "n_seeds_foreachbatch": args.n_foreachbatch,
        "n_seeds_recovery": args.n_recovery,
        "sf_dir": args.sf_dir,
        "n_divergent": len(failures),
        "shape_counts": shape_counts,
        "elapsed_sec": round(time.time() - t0, 1),
        "comparisons": "stream-vs-batch AND batch-vs-duckdb per seed",
        "divergent": failures,
    }
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in
                      ("n_seeds", "n_divergent", "shape_counts",
                       "elapsed_sec")},
                     separators=(",", ":")))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
