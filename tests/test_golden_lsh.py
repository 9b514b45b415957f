"""Golden/property tests for the three LSH ops (SURVEY §5).

Round 8 promoted these from rows-only to PROPERTY-BOOLEAN oracles: the
registered ops now return (counts + booleans) the DuckDB oracle can
hash-check, while the pair/neighbor-producing surfaces live on as
library functions. This file pins the data-level properties of those
surfaces (determinism, precision, recall floors) AND asserts the
property ops report green — so a regression fails here first, with the
raw pairs in hand for debugging.
"""

from __future__ import annotations

from dataengineeringutils_spark.operators.dedup import (
    minhash_verified_pairs,
    simhash_pairs,
)
from dataengineeringutils_spark.operators.similarity import _lsh_topk
from dataengineeringutils_spark.registry import queries

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_minhash_precision_recall_and_determinism(spark):
    exact = queries()["dedup_ngram_jaccard"]
    got = _pairs(minhash_verified_pairs(spark, SF))
    truth = _pairs(exact(spark, SF))
    # Post-verification LSH pairs are exact-Jaccard-checked: subset holds.
    assert got <= truth, got - truth
    # Banding (16 bands x 4 rows) targets ~0.5 similarity: full recall at
    # this scale today; floor pinned at 0.9 to allow benign parameter play.
    assert len(got) >= 0.9 * len(truth), (len(got), len(truth))
    assert got == _pairs(minhash_verified_pairs(spark, SF))  # deterministic


def test_minhash_property_op_reports_green(spark):
    [row] = queries()["dedup_fuzzy_minhash"](spark, SF).collect()
    assert row["n_true_pairs"] > 0
    assert row["precision_ok"] is True
    assert row["recall_ok"] is True


def test_simhash_pairs_are_valid_and_deterministic(spark):
    rows = simhash_pairs(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["doc_a"] < r["doc_b"]  # canonical orientation, no dupes
        assert 0 <= r["hamming"] <= 3  # the op's own near-dup predicate
    again = simhash_pairs(spark, SF).collect()
    assert {tuple(r) for r in rows} == {tuple(r) for r in again}


def test_simhash_property_op_reports_green(spark):
    [row] = queries()["dedup_simhash"](spark, SF).collect()
    assert row["n_docs"] == 500
    assert row["n_exact_dup_pairs"] >= 0
    assert row["exact_dup_recall_ok"] is True
    assert row["hamming_ok"] is True
    assert row["canonical_ok"] is True


def test_ann_lsh_neighbors_are_exact_valued_and_deterministic(spark):
    knn = queries()["sim_knn_join"]
    got = _lsh_topk(spark, SF).collect()
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
    again = _lsh_topk(spark, SF).collect()
    assert {tuple(r) for r in got} == {tuple(r) for r in again}


def test_ann_lsh_property_op_reports_green(spark):
    rows = queries()["sim_ann_lsh"](spark, SF).collect()
    assert len(rows) == 20  # one verdict per panel query
    for r in rows:
        assert r["n_neighbors"] == 3
        assert r["recall_ok"] is True
