"""Streaming ingestion through the custom message-queue source
(file_queue): offsets, micro-batch planning, windowed aggregation —
the Kafka-shaped path without a broker.

Run standalone:  python examples/streaming_queue.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(spark, sf_dir: str) -> None:
    from dataengineeringutils_spark.registry import queries

    qs = queries()
    agg = qs["stream_python_queue_source"](spark, sf_dir)
    print("per-type totals consumed through the queue source:")
    agg.show()
    wm = qs["stream_watermark_late"](spark, sf_dir)
    print(f"watermarked windowed agg rows: {wm.count()}")
    print("streaming queue path OK")


if __name__ == "__main__":
    from dataengineeringutils_spark.session import get_spark

    main(get_spark("example_stream"), sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
