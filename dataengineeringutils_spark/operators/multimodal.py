"""Multimodal columns (B48 + binary-column plumbing).

The engine treats image/audio/video payloads as opaque ``binary`` columns
with a typed metadata struct alongside, processed by Arrow-batched
``mapInPandas`` decoders. The decode libraries are not in this container,
so the decode kernel is a clearly-marked deterministic stub — but the
Spark-side plumbing (schema, batch iteration, UDF signature, partitioning)
is real and oracle-checked end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringutils_spark.operators.similarity import l2_norm, o_norm
from dataengineeringutils_spark.registry import query
from dataengineeringutils_spark.tables import table


@query(
    "multimodal_join",
    oracle=f"""
    SELECT e.label,
           COUNT(*) AS n,
           CAST(SUM(d.n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           ROUND(CAST(SUM(CAST({o_norm('e.embedding')} AS DECIMAL(18,9)))
                 AS DOUBLE) / COUNT(*), 6) AS avg_norm
    FROM documents d
    JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY e.label
    """,
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B48: text + vector modalities in one frame — documents ⋈ embeddings
    on doc_id = vec_id, per-label stats.

    Norm sums go through exact DECIMAL(18,9) (norms are O(1) magnitude)
    so the mean is order-independent; a final 6 dp round guards the last
    decimal digit of the 9-dp truncation boundary.
    """
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    norm = l2_norm("embedding")
    joined = d.join(e, d.doc_id == e.vec_id)
    return joined.groupBy("label").agg(
        F.count("*").alias("n"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.round(
            F.sum(norm.cast("decimal(18,9)")).cast("double") / F.count("*"), 6
        ).alias("avg_norm"),
    )


# --- binary-column plumbing ---------------------------------------------

DECODE_SCHEMA = "doc_id bigint, fmt string, n_bytes int, width int, height int"


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB decode kernel. A real deployment would do
    ``PIL.Image.open(io.BytesIO(payload)).size`` here; the image libraries
    are not in this container (NotImplementedError would be raised on real
    image bytes). The deterministic fake below keys off payload length so
    the full Spark plumbing stays testable and oracle-checkable.
    """
    n = len(payload)
    return 16 + n % 320, 16 + (n * 7) % 240


def decode_binary_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batches in, decoded metadata out."""
    for pdf in it:
        dims = pdf["payload"].map(_decode_image_stub)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "fmt": pdf["fmt"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "width": dims.map(lambda t: t[0]).astype("int32"),
                "height": dims.map(lambda t: t[1]).astype("int32"),
            }
        )


@query(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           'raw' AS fmt,
           CAST(length(text) AS INT) AS n_bytes,
           CAST(16 + length(text) % 320 AS INT) AS width,
           CAST(16 + (length(text) * 7) % 240 AS INT) AS height
    FROM documents
    WHERE doc_id < 100
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode path: text is packed into a ``binary`` payload
    column with a typed metadata struct, then decoded by an Arrow-batched
    ``mapInPandas`` kernel (stubbed — see ``_decode_image_stub``).

    The oracle recomputes the stub arithmetic from the source text (ASCII
    fixture, so byte length == char length), proving the binary round-trip
    and the batch plumbing preserve values exactly.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    packed = d.select(
        "doc_id",
        F.lit("raw").alias("fmt"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return packed.mapInPandas(decode_binary_batches, schema=DECODE_SCHEMA)


# Kernels above ship to executors; serialize this module by value so the
# driver does not need the package importable on workers (see serde.py).
from dataengineeringutils_spark.serde import pickle_module_by_value  # noqa: E402

pickle_module_by_value(__name__)
