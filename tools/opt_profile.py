"""Per-op optimization profiler (round 11).

Usage: python tools/opt_profile.py [--tag before|after] [--sf DIR] name [name ...]

For each named declared query, on one warm session (same config as
bench.py, BLAS capped):

- times CONSTRUCTION (the Python call that builds the DataFrame —
  includes any driver-side jobs the op runs while planning: bucket-count
  collects, artifact first-touch, sink writes);
- times the noop-sink EXECUTION best-of-N after one warm pass (the
  bench's timed action);
- counts Spark jobs triggered during construction vs execution (status
  tracker deltas), so "this op is slow because it runs 4 sequential
  collects while building" is visible without the UI;
- writes `.explain("formatted")` to plans/r11/<name>_<tag>.txt.

Prints one line per op:
  name  build=S (J jobs)  exec=S (J jobs)  total=S
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dataengineeringutils_spark.blas import cap_blas_env  # noqa: E402

cap_blas_env(1, force=True)

from dataengineeringutils_spark.registry import queries  # noqa: E402
from dataengineeringutils_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    tag = "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("OPT_REPEAT", "3"))
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--tag":
            tag = args[i + 1]
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    spark = get_spark("opt_profile")
    qs = queries()
    tracker = spark.sparkContext.statusTracker()
    plans_dir = os.path.join(
        REPO, "plans", os.environ.get("OPT_PLANS_ROUND", "r12")
    )
    os.makedirs(plans_dir, exist_ok=True)

    # JVM + listing warm-up
    qs["agg_group_sums"](spark, sf_dir).count()

    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"opt:{name}")
        j0 = len(tracker.getJobIdsForGroup() or [])  # noqa: F841

        def _jobs() -> int:
            # status tracker job ids are global and monotonically grow
            ids = tracker.getJobIdsForGroup(None)
            return max(ids) + 1 if ids else 0

        # warm construction + execution once (artifact first-touch, JIT)
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:42s}  WARM-FAIL {type(exc).__name__}: {exc}")
            continue

        b0 = _jobs()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        b1 = _jobs()

        # plan capture (on the warm-constructed df)
        try:
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:  # noqa: BLE001
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)

        best = float("inf")
        e_jobs = 0
        for _ in range(repeat):
            e0 = _jobs()
            t1 = time.perf_counter()
            df2 = fn(spark, sf_dir)
            df2.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t1
            e_jobs = _jobs() - e0
            best = min(best, dt)
        print(
            f"{name:42s}  build={t_build:6.3f}s ({b1 - b0:2d} jobs)  "
            f"bestfull={best:6.3f}s ({e_jobs:2d} jobs)"
        )
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
