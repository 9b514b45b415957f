"""Second bench artifact (round-6 VERDICT #7): run bench.py in a CLEAN
subprocess (fresh JVM, fresh session caches, nothing else on the
machine) and record the full result to BENCH_REPLICA.json in the same
shape the round driver records — so every round carries at least one
complete bench artifact even if the driver's own run flakes.

Usage: python tools/bench_replica.py  (from an otherwise idle machine;
~10-12 min at sf0.1)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    t0 = time.time()
    # Provenance (round-10 VERDICT #4): bench.py stamps its artifacts
    # with {"source": $BENCH_SOURCE or "driver"} — mark this run so
    # BENCH_FULL.json written by the replica is distinguishable from a
    # driver run without p50 forensics.
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=5400,
        env={**os.environ, "BENCH_SOURCE": "replica"},
    )
    parsed = None
    for line in reversed(r.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                pass
            break
    full = None
    try:
        with open(os.path.join(REPO, "BENCH_FULL.json")) as f:
            full = json.load(f)
    except OSError:
        pass
    out = {
        "rc": r.returncode,
        "parsed": parsed,
        "elapsed_sec": round(time.time() - t0, 1),
        "full_queries": (full or {}).get("queries"),
        "provenance": (full or {}).get("provenance"),
        "blas_probe": (full or {}).get("blas_probe"),
        "stderr_tail": r.stderr[-500:] if r.returncode != 0 else "",
    }
    with open(os.path.join(REPO, "BENCH_REPLICA.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "rc": r.returncode,
                "p50": (parsed or {}).get("value"),
                "p95": (parsed or {}).get("p95"),
                "n_queries": (parsed or {}).get("n_queries"),
                "n_errors": (parsed or {}).get("n_errors"),
            }
        )
    )
    return 0 if r.returncode == 0 and parsed else 1


if __name__ == "__main__":
    raise SystemExit(main())
