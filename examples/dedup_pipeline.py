"""LLM-corpus cleaning pipeline: quality gate -> exact dedup ->
MinHash-LSH near-dup clusters -> stable train/val/test split counts.

Run standalone:  python examples/dedup_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(spark, sf_dir: str) -> None:
    from dataengineeringutils_spark.registry import queries

    qs = queries()
    clean = qs["pipeline_clean_corpus"](spark, sf_dir)
    print("cleaned corpus summary:")
    clean.show(5, truncate=False)

    pairs = qs["dedup_fuzzy_minhash"](spark, sf_dir)
    n_pairs = pairs.count()
    clusters = qs["dedup_connected_components"](spark, sf_dir)
    print(f"near-dup pairs: {n_pairs}; cluster rows: {clusters.count()}")

    splits = qs["dataset_split_holdout"](spark, sf_dir)
    splits.show()
    leak = qs["ml_train_test_leakage_check"](spark, sf_dir)
    print("train->test exact-text leakage:")
    leak.show()
    print("dedup pipeline OK")


if __name__ == "__main__":
    from dataengineeringutils_spark.session import get_spark

    main(get_spark("example_dedup"), sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
