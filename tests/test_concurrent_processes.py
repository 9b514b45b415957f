"""Two Spark PROCESSES running sink/catalog ops at the same time must
not collide: scratch paths and managed-table names are PID-keyed
(round-2 saw a real cross-process collision between sink_bucketed_join
and verify_local; round-3 made commits put-if-absent; this pins the
whole seam with an actual concurrent run — round-3 VERDICT item 5)."""

from __future__ import annotations

import os
import subprocess
import sys

SF = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ops that write scratch paths, managed tables, and txn logs — the
# surfaces that can collide across processes
OPS = ["sink_bucketed_join", "sink_txn_log_table", "sink_csv_roundtrip"]

_CHILD = f"""
import sys
sys.path.insert(0, {REPO!r})
from dataengineeringutils_spark.session import get_spark
spark = get_spark("concurrent_child")
import __spark_entry__ as E
q = E.queries()
for name in {OPS!r}:
    n = q[name](spark, {SF!r}).count()
    assert n >= 0
print("CHILD_OK")
"""


def test_concurrent_processes_do_not_collide(spark):
    child = subprocess.Popen(
        [sys.executable, "-c", _CHILD],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        # run the same sink ops in THIS process while the child runs them
        import __spark_entry__ as E

        q = E.queries()
        for _ in range(2):
            for name in OPS:
                assert q[name](spark, SF).count() >= 0
        out, _ = child.communicate(timeout=180)
    finally:
        if child.poll() is None:
            child.kill()
    assert child.returncode == 0, f"child failed:\n{out[-4000:]}"
    assert "CHILD_OK" in out


def test_scratch_and_table_names_are_pid_keyed():
    from dataengineeringutils_spark.paths import process_suffix, scratch_dir

    assert f"pid-{os.getpid()}" in scratch_dir("x")
    assert process_suffix() == f"p{os.getpid()}"
