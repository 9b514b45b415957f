"""Similarity-search serving path: exact top-k baseline, IVF candidate
search, recall audit, and the bucket-pruned cell layout a serving tier
reads.

Run standalone:  python examples/ann_serving.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(spark, sf_dir: str) -> None:
    from dataengineeringutils_spark.registry import queries

    qs = queries()
    print("exact top-10 for vec 0 (brute-force baseline):")
    qs["sim_topk_cosine"](spark, sf_dir).show(5)
    print("IVF candidate search (multiprobe):")
    qs["sim_ann_ivf_multiprobe"](spark, sf_dir).show(5)
    print("IVF with the fixed-k quantizer (bounded broadcast — the 100 TB path):")
    qs["sim_ann_ivf_fixedk"](spark, sf_dir).show(5)
    print("LSH recall audit (gate: recall@3 floor):")
    qs["sim_lsh_recall_eval"](spark, sf_dir).show()
    print("3-NN label-coherence eval:")
    qs["embeddings_knn_classifier_eval"](spark, sf_dir).show()
    print("ANN serving path OK")


if __name__ == "__main__":
    from dataengineeringutils_spark.session import get_spark

    main(get_spark("example_ann"), sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
