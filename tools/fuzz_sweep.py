"""Deep differential fuzz sweep: N seeded queries, Spark vs DuckDB.

Usage: python tools/fuzz_sweep.py [--n 2000] [--sf-dir DIR] [--json OUT]

Writes a summary artifact (default FUZZ.json) with per-shape counts and
every divergent seed's SQL + first differences. The pytest gate
(tests/test_fuzz_differential.py) runs the first 120 seeds of the same
sequence; this tool is the deep version for round evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dataengineeringutils_spark.fuzzgen import gen_query, run_case  # noqa: E402
from dataengineeringutils_spark.session import get_spark  # noqa: E402
from tools.verify_local import duck_connect  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "FUZZ_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--json", default=os.path.join(REPO, "FUZZ.json"))
    args = ap.parse_args()

    spark = get_spark("fuzz-sweep")
    con = duck_connect(args.sf_dir)
    t0 = time.time()
    shape_counts: dict[str, int] = {}
    failures = []
    for seed in range(1, args.n + 1):
        shape = gen_query(seed)["shape"]
        shape_counts[shape] = shape_counts.get(shape, 0) + 1
        r = run_case(spark, con, args.sf_dir, seed)
        if not r["ok"]:
            failures.append(r)
            print(f"DIVERGE seed={seed}: {r['issues'][:2]}\n  {r['sql']}")
        if seed % 250 == 0:
            print(f"... {seed}/{args.n} ({time.time() - t0:.0f}s, "
                  f"{len(failures)} divergent)")
    out = {
        "n_seeds": args.n,
        "sf_dir": args.sf_dir,
        "n_divergent": len(failures),
        "shape_counts": shape_counts,
        "elapsed_sec": round(time.time() - t0, 1),
        "divergent": failures,
    }
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in
                      ("n_seeds", "n_divergent", "shape_counts",
                       "elapsed_sec")}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
