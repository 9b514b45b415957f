"""Core-count scaling bench (round-11 VERDICT item 5).

The driver's 8-vs-32-core ratios at sf0.1 sit at ~1 everywhere because
every query there is dominated by fixed per-query cost (plan analysis,
job scheduling, noop-sink overhead) — core count cannot register on
1-second queries over 10 MB inputs. This tool produces the meaningful
version of that signal: the SCALE_STRESS 40-op heavy panel on the 10x
scaled fixture (~sf1: 6M lineitem / 1M events / 50k documents), timed in
TWO fresh processes — ``local[8]`` and ``local[32]`` via the same
``SPARK_GRAFT_CPUS`` contract the driver uses (session.py) — and the
per-op ratio t8/t32 written to ``BENCH_SCALING.json``.

Usage:  python tools/bench_scaling.py          (~30-40 min total)
        SCALING_REPEAT=N  timed repeats per op per core count (default 2)

Methodology matches bench.py: BLAS env capped to 1 thread before the JVM
starts, one warm untimed pass over every op, interleaved best-of-N timed
repeats, noop sink as the timed action. The two core counts run
SEQUENTIALLY in separate processes (never two Sparks at once — measured
±3x swings). The scaled fixture is the deterministic shared one
``tests/test_scale_stress.py`` builds (built here if absent, ~10 min
one-time).
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from dataengineeringutils_spark.blas import cap_blas_env
cap_blas_env(1, force=True)
from dataengineeringutils_spark.registry import queries
from dataengineeringutils_spark.session import get_spark

ops = {ops!r}
sf_dir = {sf_dir!r}
repeat = {repeat!r}
spark = get_spark("bench-scaling")
qs = {{n: queries()[n] for n in ops}}
sc = spark.sparkContext


def run(name):
    sc.setJobDescription(f"scaling: {{name}}")
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    sc.setJobDescription(None)


for name in ops:  # warm pass: C2 JIT, artifact first-touch, file listing
    run(name)
best = {{n: float("inf") for n in ops}}
for _ in range(repeat):  # interleaved best-of-N (bench.py rationale)
    for name in ops:
        t0 = time.perf_counter()
        run(name)
        best[name] = min(best[name], time.perf_counter() - t0)
print("SCALING " + json.dumps({{n: round(v, 3) for n, v in best.items()}}))
"""


def _load_scale_stress():
    spec = importlib.util.spec_from_file_location(
        "scale_stress", os.path.join(REPO, "tests", "test_scale_stress.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _timed_child(cpus: int, ops: list[str], sf_dir: str, repeat: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    code = _CHILD.format(repo=REPO, ops=ops, sf_dir=sf_dir, repeat=repeat)
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        timeout=7200,
    )
    for line in r.stdout.splitlines():
        if line.startswith("SCALING "):
            return json.loads(line[len("SCALING "):])
    raise RuntimeError(
        f"local[{cpus}] child produced no SCALING line; stderr tail: "
        + r.stderr[-2000:]
    )


def main() -> int:
    repeat = int(os.environ.get("SCALING_REPEAT", "2"))
    ss = _load_scale_stress()
    ops = [n for n, _ in ss.HEAVY_OPS]

    # Build (or find) the shared deterministic 10x fixture. The builder
    # needs a Spark session; stop it before any timing child starts.
    from dataengineeringutils_spark.session import get_spark

    spark = get_spark("scaling-fixture-build")
    scaled = ss._build_scaled(spark, ss.K)
    spark.stop()
    print(f"[scaling] fixture: {scaled}", file=sys.stderr)

    results = {}
    for cpus in (32, 8):
        print(f"[scaling] timing local[{cpus}] ...", file=sys.stderr)
        results[cpus] = _timed_child(cpus, ops, scaled, repeat)

    per_op = {}
    for n in ops:
        t32, t8 = results[32].get(n), results[8].get(n)
        if t32 and t8:
            per_op[n] = {
                "t_c8": t8,
                "t_c32": t32,
                "ratio": round(t8 / t32, 2),
            }
    ratios = sorted(v["ratio"] for v in per_op.values())
    out = {
        "sf_dir": scaled,
        "k": ss.K,
        "cpus": [8, 32],
        "repeat": repeat,
        "ops": per_op,
        "n_ops": len(per_op),
        "n_ratio_ge_2": sum(1 for r in ratios if r >= 2.0),
        "median_ratio": ratios[len(ratios) // 2] if ratios else None,
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items() if k != "ops"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
