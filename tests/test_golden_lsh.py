"""Golden/property tests for the three rows-only LSH ops (SURVEY §5).

These ops are rows-only at the oracle gate because LSH RECALL is
probabilistic by design. Everything else about them is deterministic
(seed-pinned hashes, fixed banding) and is pinned here:

- determinism: two invocations return identical row sets;
- precision: every emitted pair/neighbor survives its exact predicate;
- recall floor: against the exact ground-truth op, pinned at the level
  the current parameters achieve at sf0.001 — a refactor that silently
  degrades recall fails this, not the driver's weak row-count check.
"""

from __future__ import annotations

from dataengineeringutils_spark.registry import queries

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_minhash_precision_recall_and_determinism(spark):
    fuzzy = queries()["dedup_fuzzy_minhash"]
    exact = queries()["dedup_ngram_jaccard"]
    got = _pairs(fuzzy(spark, SF))
    truth = _pairs(exact(spark, SF))
    # Post-verification LSH pairs are exact-Jaccard-checked: subset holds.
    assert got <= truth, got - truth
    # Banding (16 bands x 4 rows) targets ~0.5 similarity: full recall at
    # this scale today; floor pinned at 0.9 to allow benign parameter play.
    assert len(got) >= 0.9 * len(truth), (len(got), len(truth))
    assert got == _pairs(fuzzy(spark, SF))  # deterministic


def test_simhash_pairs_are_valid_and_deterministic(spark):
    op = queries()["dedup_simhash"]
    rows = op(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["doc_a"] < r["doc_b"]  # canonical orientation, no dupes
        assert 0 <= r["hamming"] <= 3  # the op's own near-dup predicate
    again = op(spark, SF).collect()
    assert {tuple(r) for r in rows} == {tuple(r) for r in again}


def test_ann_lsh_neighbors_are_exact_valued_and_deterministic(spark):
    ann = queries()["sim_ann_lsh"]
    knn = queries()["sim_knn_join"]
    got = ann(spark, SF).collect()
    assert got
    # <= 3 neighbors per query (top-3 re-rank over probed buckets).
    per_q = {}
    for r in got:
        per_q.setdefault(r["q_id"], []).append(r)
    assert max(len(v) for v in per_q.values()) <= 3
    # Where ANN and exact kNN agree on a neighbor, the similarity is the
    # SAME number — the approximation is in candidate recall, never in
    # the scored value.
    exact_vals = {
        (r["q_id"], r["vec_id"]): r["cos_sim"] for r in knn(spark, SF).collect()
    }
    overlap = [r for r in got if (r["q_id"], r["vec_id"]) in exact_vals]
    assert overlap  # buckets always recover some true neighbors
    for r in overlap:
        assert abs(exact_vals[(r["q_id"], r["vec_id"])] - r["cos_sim"]) < 1e-9
    # Determinism: hyperplanes are seed-pinned.
    again = ann(spark, SF).collect()
    assert {tuple(r) for r in got} == {tuple(r) for r in again}
