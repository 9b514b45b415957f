"""Empirical 100×-scale evidence (round-5 VERDICT #3): replicate the
sf0.1 fixture K× with shifted keys (seeded, deterministic), run the
heaviest batch operators at both scales IN THE SAME SESSION, and assert

(a) runtime grows ≲ linearly in K (per-op declared exponent: 1.0 for
    everything except ops whose OUTPUT is super-linear in the data by
    definition), and
(b) no qualifying stage is skew-bound: the slowest task's share of the
    stage's total task time stays under a threshold (a hot key would
    push one task toward the whole stage's work).

This converts the docstrings' "would survive a 100× scale-up" claims
into a measured artifact. Run explicitly (deselected by default via the
``scale`` marker):

    pytest tests/test_scale_stress.py -m scale -q -s

Honest limits: local[32] measures plan shape (shuffle volume, partition
balance, spill-free hash aggs), not network. K defaults to 10 (≈ sf1:
6M lineitem / 1M events / 50k documents); raise SCALE_STRESS_K with a
bigger disk budget. Timing runs warm, best-of-2, one Spark process —
do not run concurrently with another Spark job.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from dataengineeringutils_spark.paths import scratch_dir

pytestmark = pytest.mark.scale

BASE = os.environ.get("SCALE_STRESS_BASE", "/root/testdata/sf0.1")
K = int(os.environ.get("SCALE_STRESS_K", "10"))

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# key columns shifted by copy*SHIFT so every copy is a disjoint,
# FK-consistent shard of the same star schema (nation/region stay
# shared dimensions — their keys are never shifted)
SHIFT = 10_000_000
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# (op name, growth exponent e): assert t_K <= SLACK * K**e * t_1.
# e=1.0 is the design claim for the pipeline ops; dedup/similarity ops
# are kept at e=1.0 TOO because the scaled corpus perturbs text and
# embeddings per copy (below) so near-dup cluster DENSITY stays
# constant — exact-duplicate blowup would otherwise make candidate
# pairs (and the true output) grow K², which is the data's fault, not
# the plan's. join_theta_range's output genuinely grows ~K² (band
# predicates over an overlaid value space), so it carries e=2.
HEAVY_OPS = [
    ("text_char_trigram_signature", 1.0),
    ("profile_summary", 1.0),
    ("text_ngram_profile", 1.0),
    ("customer_supplier_switching", 1.0),
    ("part_demand_classification", 1.0),
    ("win_distribution", 1.0),
    ("supplier_dual_sourcing_coverage", 1.0),
    ("sample_poisson_bootstrap", 1.0),
    ("ml_rank_auc", 1.0),
    ("orders_reconciliation", 1.0),
    ("text_token_head_coverage", 1.0),
    ("agg_weighted_median", 1.0),
    ("text_repetition_score", 1.0),
    ("agg_median_twophase", 1.0),
    ("dedup_fuzzy_minhash", 1.0),
    ("dedup_simhash", 1.0),
    ("text_contamination_ngram", 1.0),
    ("orders_abc_class", 1.0),
    ("customer_ltv_deciles", 1.0),
    ("events_power_users_pareto", 1.0),
    ("text_zipf_slope", 1.0),
    ("orders_skyline_2d", 1.0),
    ("join_theta_range", 2.0),
    # round-8 VERDICT #4: pin the GEMM-kernel + two-phase-selection ops
    # with machine-attributable bounds. dedup_embedding_cosine is exact
    # all-pairs by declared semantics (block GEMM, n²/p independent
    # tasks) — its work genuinely grows K², like join_theta_range's
    # output. agg_percentile_disc crosses the TWO_PHASE_MIN_ROWS switch
    # at 10x orders, so the stress exercises the bounded-bucket path the
    # small fixture never runs.
    ("dedup_embedding_cosine", 2.0),
    ("agg_percentile_disc", 1.0),
    # round-9 VERDICT #2: the two ops whose global cumulative windows
    # converted to the bucket-cut two-phase plan this round; at 10x
    # events/lineitem both cross the TWO_PHASE_MIN_ROWS switch, so the
    # stress runs the at-scale path the small fixture never exercises.
    ("events_ks_two_sample", 1.0),
    ("orders_abc_migration", 1.0),
    # round-10 VERDICT #4: widen past the 25-op panel — the families the
    # panel skipped, chosen by "largest frame touched by a window or
    # self-join": the iterative graph ops (self-join per round over the
    # co-purchase / supplier edge sets), the newest two-phase converts,
    # the heaviest dq profiles, the corpus mixing/boilerplate text ops,
    # and the txn-log sinks (full write+read-back cycle). Shards are
    # key-disjoint, so graph components never bridge copies and the
    # iterative ops stay linear by construction.
    ("graph_triangle_count", 1.0),
    ("hierarchy_depth_doubling", 1.0),
    ("graph_pagerank", 1.0),
    ("graph_kcore_2", 1.0),
    ("corpus_mixing_sample", 1.0),
    ("text_boilerplate_phrases", 1.0),
    ("dq_outlier_iqr_fences", 1.0),
    ("dq_fanout_profile", 1.0),
    ("events_value_ecdf", 1.0),
    ("events_session_gap_sensitivity", 1.0),
    ("events_markov_stationary", 1.0),
    ("sink_txn_merge_upsert", 1.0),
    ("sink_txn_log_table", 1.0),
]

SLACK = 2.5  # fixed-overhead + timing-noise allowance on t_K <= SLACK*K^e*t_1
SKEW_MAX_SHARE = 0.35  # slowest task's share of stage task-time
SKEW_MIN_TASKS = 16  # only stages wide enough for the share to mean skew
SKEW_MIN_STAGE_MS = 3000  # only stages with real work


def _build_scaled(spark, k: int) -> str:
    """K FK-consistent shards of the sf0.1 star schema. Text and
    embeddings are perturbed per copy (deterministic, length-preserving)
    so the scaled corpus has the same near-duplicate DENSITY as the
    original instead of k exact copies of every doc.

    The fixture is deterministic and read-only once built, so it lives
    in a SHARED (non-PID) scratch dir and is built once per machine, not
    once per process (build: ~10 min; this test re-runs much more often
    than the base fixture changes). Concurrent builders race benignly:
    each builds under a PID-keyed tmp dir and the first atomic rename
    wins."""
    import shutil

    from pyspark.sql import functions as F

    shared_root = os.path.join(
        os.path.dirname(os.path.dirname(scratch_dir("probe"))), "shared"
    )
    final = os.path.join(shared_root, f"scale_stress_k{k}")
    marker = os.path.join(final, "_BUILT")
    if os.path.exists(marker):
        return final
    os.makedirs(shared_root, exist_ok=True)
    # reclaim multi-GB *.tmp-<pid> orphans left by builders that died
    # mid-build (ADVICE r6): the shared root is never swept otherwise
    for entry in os.listdir(shared_root):
        if ".tmp-" not in entry:
            continue
        pid_s = entry.rsplit(".tmp-", 1)[-1]
        if not pid_s.isdigit() or int(pid_s) == os.getpid():
            continue
        try:
            os.kill(int(pid_s), 0)  # raises if the builder is gone
        except ProcessLookupError:
            shutil.rmtree(os.path.join(shared_root, entry), ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another uid — leave it
    out = f"{final}.tmp-{os.getpid()}"
    alpha = "abcdefghijklmnopqrstuvwxyz"
    for t in TABLES:
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        if t in ("region", "nation"):
            df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
            continue
        copies = []
        for i in range(k):
            c = df
            for kc in KEY_COLS.get(t, []):
                c = c.withColumn(kc, F.col(kc) + F.lit(i * SHIFT))
            if t == "documents" and i > 0:
                # rotate the alphabet by i: same length/whitespace
                # structure, different shingles per copy
                rot = alpha[i % 26 :] + alpha[: i % 26]
                c = c.withColumn("text", F.translate("text", alpha, rot))
            if t == "embeddings" and i > 0:
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: x
                        + (F.lit(float(i)) * 0.01) * F.cos(j.cast("double")),
                    ),
                )
            copies.append(c)
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionByName(c)
        scaled.repartition(32).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    with open(os.path.join(out, "_BUILT"), "w") as f:
        f.write(str(k))
    try:
        os.rename(out, final)
    except OSError:
        # another builder won the race; its fixture is identical
        shutil.rmtree(out, ignore_errors=True)
    return final


def _timed_run(spark, fn, sf: str, group: str) -> tuple[float, list[int]]:
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    t0 = time.time()
    fn(spark, sf).collect()
    secs = time.time() - t0
    sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    stage_ids = []
    for j in jobs:
        ji = sc.statusTracker().getJobInfo(j)
        if ji is not None:
            stage_ids += list(ji.stageIds)
    return secs, stage_ids


def _stage_skews(spark, stage_ids: list[int]) -> list[tuple[int, float, int, int]]:
    """(stage_id, max_task_share, n_tasks, total_ms) for qualifying
    stages, via the live AppStatusStore (the same numbers the UI's
    stage page shows)."""
    store = spark.sparkContext._jsc.sc().statusStore()
    out = []
    for sid in set(stage_ids):
        try:
            tl = store.taskList(sid, 0, 100_000)
        except Exception:
            continue
        durs = []
        for i in range(tl.size()):
            d = tl.apply(i).duration()
            if d.nonEmpty():
                durs.append(int(d.get()))
        if len(durs) < SKEW_MIN_TASKS or sum(durs) < SKEW_MIN_STAGE_MS:
            continue
        out.append((sid, max(durs) / sum(durs), len(durs), sum(durs)))
    return out


def _reprobe_fresh_session(name: str, scaled: str) -> dict | None:
    """Re-measure one op at both scales in a clean subprocess (fresh
    JVM, fresh session caches): warm once, best-of-2 timed, per scale.
    Returns {"t1": s, "tk": s} or None if the subprocess failed."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys, time, json\n"
        f"sys.path.insert(0, {repo!r})\n"
        "from dataengineeringutils_spark.session import get_spark\n"
        "from dataengineeringutils_spark.registry import queries\n"
        "spark = get_spark('scale-reprobe')\n"
        f"fn = queries()[{name!r}]\n"
        "out = {}\n"
        f"for tag, d in (('t1', {BASE!r}), ('tk', {scaled!r})):\n"
        "    fn(spark, d).collect()\n"
        "    best = float('inf')\n"
        "    for _ in range(2):\n"
        "        t0 = time.perf_counter()\n"
        "        fn(spark, d).collect()\n"
        "        best = min(best, time.perf_counter() - t0)\n"
        "    out[tag] = best\n"
        "print('REPROBE ' + json.dumps(out))\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=900,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in r.stdout.splitlines():
        if line.startswith("REPROBE "):
            return json.loads(line[len("REPROBE "):])
    return None


def test_heavy_ops_scale_linearly_and_unskewed(spark):
    from dataengineeringutils_spark.registry import queries

    qs = queries()
    scaled = _build_scaled(spark, K)
    # Warm pass over every op at both scales (plan compile, broadcast
    # build, session caches, C2 on the hot generated methods).
    for name, _ in HEAVY_OPS:
        qs[name](spark, BASE).collect()
        qs[name](spark, scaled).collect()
    # Timed repeats are INTERLEAVED (full pass over all ops per round,
    # best across rounds) rather than back-to-back, for the same reason
    # bench.py interleaves: host CPU bursts last minutes, so a burst
    # poisons ALL back-to-back repeats of one op but at most one
    # interleaved round of it (measured: identical queries swing
    # 2 s -> 20 s inside a burst window, independent of codegen).
    t1: dict[str, float] = {n: float("inf") for n, _ in HEAVY_OPS}
    tk: dict[str, float] = dict(t1)
    stages: dict[str, list[int]] = {n: [] for n, _ in HEAVY_OPS}
    for r in range(3):
        for name, _ in HEAVY_OPS:
            t1[name] = min(
                t1[name], _timed_run(spark, qs[name], BASE, f"ss_{name}_b{r}")[0]
            )
        for name, _ in HEAVY_OPS:
            secs, sids = _timed_run(spark, qs[name], scaled, f"ss_{name}_k{r}")
            tk[name] = min(tk[name], secs)
            stages[name] += sids
    report = {}
    failures = []
    for name, e in HEAVY_OPS:
        bound = SLACK * (K**e) * t1[name]
        reprobed = False
        if tk[name] > bound:
            # Fresh-session re-probe (round-6 VERDICT #5): a host burst
            # or a one-off C2 JIT storm can inflate a first measurement
            # by >4x (dedup_simhash, round 6: 30.6 s in-harness vs
            # 6.3-7.5 s re-probed). Re-measure the failing row in a
            # clean subprocess so the ARTIFACT carries the defensible
            # number instead of a prose escape hatch.
            fresh = _reprobe_fresh_session(name, scaled)
            if fresh is not None:
                # Use the fresh (t1, tk) PAIR atomically (round-7 ADVICE:
                # elementwise min across sessions let the ratio mix
                # measurements from different environments and biased it
                # toward passing) — the reprobe replaces the in-harness
                # row only if ITS OWN ratio is the better-conditioned one.
                if fresh["tk"] / fresh["t1"] < tk[name] / t1[name]:
                    t1[name], tk[name] = fresh["t1"], fresh["tk"]
                bound = SLACK * (K**e) * t1[name]
                reprobed = True
        skews = _stage_skews(spark, stages[name])
        worst_skew = max((s[1] for s in skews), default=0.0)
        report[name] = {
            "t_sf0.1": round(t1[name], 3),
            f"t_x{K}": round(tk[name], 3),
            "ratio": round(tk[name] / t1[name], 2),
            "bound": round(bound, 2),
            "exponent": e,
            "worst_stage_share": round(worst_skew, 3),
            "n_qualifying_stages": len(skews),
        }
        if reprobed:
            report[name]["reprobed_fresh_session"] = True
        if tk[name] > bound:
            failures.append(
                f"{name}: t_x{K}={tk[name]:.2f}s > bound {bound:.2f}s "
                f"(t1={t1[name]:.2f}s, e={e}, fresh-session reprobe "
                f"{'ran' if reprobed else 'unavailable'})"
            )
        for sid, share, n, tot in skews:
            if share > SKEW_MAX_SHARE:
                failures.append(
                    f"{name}: stage {sid} skew-bound — max task {share:.0%} "
                    f"of {tot}ms across {n} tasks"
                )
    with open(os.path.join(os.path.dirname(__file__), "..", "SCALE_STRESS.json"), "w") as f:
        json.dump({"k": K, "base": BASE, "ops": report}, f, indent=1, sort_keys=True)
    assert not failures, "\n".join(failures)
