"""BLAS thread-pool capping for Python-worker kernels.

Every PySpark Python worker is its own process, and the bundled
OpenBLAS defaults its pool to ALL host cores (measured: 32 on the
local[32] harness). A mapInPandas GEMM kernel therefore runs up to
32 workers x 32 BLAS threads = 1024 runnable threads on 32 CPUs —
harmless solo, but under the driver bench's serial 484-query load the
oversubscription showed up as 2-3x wall-time inflation on the matmul
ops (round-8 VERDICT: the five load-only >2 s crossings). The right
size is the task's CPU share: local[N] schedules one task per core,
so ONE BLAS thread per worker keeps the machine exactly subscribed.

Two layers, both idempotent:

- Environment (``cap_blas_env``): set the standard thread-count vars
  before the JVM forks the Python daemon, so every worker's OpenBLAS
  initializes capped. Called from bench/verify entrypoints and pinned
  as ``spark.executorEnv.*`` by session.py for sessions we build.
- Runtime (``cap_blas_threads``): OpenBLAS reads its env only at
  library load, so a kernel running inside a FOREIGN session (the
  round driver's own SparkSession) needs the loaded library re-capped:
  scan /proc/self/maps for the OpenBLAS .so and call its
  ``openblas_set_num_threads`` export. Kernels call this at batch-0;
  the setting survives worker reuse and daemon forks (it is plain
  process state, inherited and re-applied cheaply).
"""

from __future__ import annotations

import ctypes
import os

_ENV_VARS = (
    "OMP_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "MKL_NUM_THREADS",
    "NUMEXPR_NUM_THREADS",
    "VECLIB_MAXIMUM_THREADS",
)


def cap_blas_env(n: int = 1, force: bool = False) -> None:
    """Cap via environment (effective for libraries not yet loaded).

    Library callers use the default ``setdefault`` path so an operator's
    explicit setting wins. MEASUREMENT entrypoints (bench.py,
    tools/verify_local.py, tools/bench_artifacts.py) pass ``force=True``:
    a pre-existing host ``OMP_NUM_THREADS``/``OPENBLAS_NUM_THREADS``
    (common in CI images) would otherwise silently defeat the cap and
    make published bench numbers depend on the ambient environment
    (round-9 ADVICE). Force mode overwrites and prints one line per
    variable it had to override, so the provenance is in the log."""
    for var in _ENV_VARS:
        prev = os.environ.get(var)
        if prev is None:
            os.environ[var] = str(n)
        elif force and prev != str(n):
            print(
                f"[blas] overriding ambient {var}={prev} -> {n} "
                "(measurement entrypoint pins BLAS threads)"
            )
            os.environ[var] = str(n)


_CAPPED_AT: int | None = None


def cap_blas_threads(n: int = 1) -> None:
    """Cap the ALREADY-LOADED OpenBLAS pool (no-op if none is loaded).
    Safe to call per Arrow batch: memoized after the first success."""
    global _CAPPED_AT
    if _CAPPED_AT == n:
        return
    cap_blas_env(n)
    try:
        with open("/proc/self/maps") as fh:
            libs = sorted(
                {
                    ln.split()[-1]
                    for ln in fh
                    if "openblas" in ln.lower() and ln.split()[-1].endswith(".so")
                }
            )
    except OSError:
        libs = []
    for lib in libs:
        try:
            dll = ctypes.CDLL(lib)
        except OSError:
            continue
        for sym in ("openblas_set_num_threads64_", "openblas_set_num_threads"):
            fn = getattr(dll, sym, None)
            if fn is not None:
                fn(n)
                break
    _CAPPED_AT = n


# Kernels call cap_blas_threads from executor processes that cannot
# import this package (see serde.py) — ship the module inside the pickle.
from dataengineeringutils_spark.serde import pickle_module_by_value  # noqa: E402

pickle_module_by_value(__name__)
