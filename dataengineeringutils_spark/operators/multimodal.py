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
from pyspark.sql.window import Window

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


RESIZE_MAX = 256
RESIZE_SCHEMA = "doc_id bigint, width int, height int, out_w int, out_h int"


def resize_dims(w: int, h: int, cap: int = RESIZE_MAX) -> tuple[int, int]:
    """STUB resize kernel (dimension arithmetic only). A real deployment
    resizes pixel buffers here (PIL/cv2 — not in this container); the
    fit-within-cap integer arithmetic below is exactly what those
    libraries' thumbnail paths compute, so the Spark plumbing and the
    oracle check the real contract."""
    m = max(w, h)
    if m <= cap:
        return w, h
    return max(1, w * cap // m), max(1, h * cap // m)


def resize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: decode dims from the payload (stub), then
    compute fit-within-256 output dims."""
    for pdf in it:
        dims = pdf["payload"].map(_decode_image_stub)
        w = dims.map(lambda t: t[0])
        h = dims.map(lambda t: t[1])
        out = [resize_dims(a, b) for a, b in zip(w, h)]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": w.astype("int32"),
                "height": h.astype("int32"),
                "out_w": pd.Series([t[0] for t in out], dtype="int32", index=pdf.index),
                "out_h": pd.Series([t[1] for t in out], dtype="int32", index=pdf.index),
            }
        )


@query(
    "multimodal_resize",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               CAST(16 + length(text) % 320 AS INT) AS width,
               CAST(16 + (length(text) * 7) % 240 AS INT) AS height
        FROM documents
        WHERE doc_id < 100
    )
    SELECT doc_id,
           width,
           height,
           CAST(CASE WHEN greatest(width, height) <= 256 THEN width
                ELSE greatest(1, width * 256 // greatest(width, height)) END AS INT) AS out_w,
           CAST(CASE WHEN greatest(width, height) <= 256 THEN height
                ELSE greatest(1, height * 256 // greatest(width, height)) END AS INT) AS out_h
    FROM dims
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing: binary payload -> decoded dims -> fit-within-
    256 output dims, via Arrow-batched ``mapInPandas`` (stub kernels).

    The oracle recomputes both stubs' integer arithmetic from the source
    text, checking the full binary -> Arrow batch -> kernel round-trip.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    packed = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return packed.mapInPandas(resize_batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, n_frames int, frame_idx int"
FRAME_STRIDE = 7


def frame_sample_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: 1 -> N expansion, one row per sampled frame.
    STUB decode: frame count keys off payload length (a real deployment
    reads the container header via pyav/ffmpeg — not in this container)."""
    for pdf in it:
        doc_ids, counts, idxs = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = 1 + len(payload) % 100
            sampled = range(0, n_frames, FRAME_STRIDE)
            for fi in sampled:
                doc_ids.append(doc_id)
                counts.append(n_frames)
                idxs.append(fi)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "n_frames": pd.Series(counts, dtype="int32"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
            }
        )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(n_frames AS INT) AS n_frames,
           CAST(UNNEST(range(0, n_frames, 7)) AS INT) AS frame_idx
    FROM (
        SELECT doc_id, 1 + length(text) % 100 AS n_frames
        FROM documents
        WHERE doc_id < 100
    )
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: binary payload -> frame count (stub
    header decode) -> every-7th-frame expansion (1 row per sampled frame)
    via Arrow-batched ``mapInPandas``.

    This is the UDTF-shaped multimodal path: output cardinality is
    data-dependent, so the kernel yields variable-length batches; Spark
    never materializes per-document frame lists as single rows.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    packed = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return packed.mapInPandas(frame_sample_batches, schema=FRAME_SCHEMA)


AUDIO_SCHEMA = "doc_id bigint, n_samples int, duration_ms int, peak int"
AUDIO_RATE = 16  # stub samples per millisecond (16 kHz)


def audio_feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: audio feature extraction over binary payloads.
    STUB decode: sample count / duration / peak derive from payload bytes
    (a real deployment decodes PCM via soundfile/librosa — not in this
    container); the arithmetic is vectorized numpy over the Arrow batch."""
    import numpy as np

    for pdf in it:
        lens = pdf["payload"].map(len).to_numpy(dtype=np.int64)
        firsts = pdf["payload"].map(lambda b: b[0] if len(b) else 0).to_numpy(
            dtype=np.int64
        )
        n_samples = lens * 4
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_samples": pd.Series(n_samples, dtype="int32", index=pdf.index),
                "duration_ms": pd.Series(
                    n_samples // AUDIO_RATE, dtype="int32", index=pdf.index
                ),
                "peak": pd.Series(
                    (firsts * 129) % 32768, dtype="int32", index=pdf.index
                ),
            }
        )


@query(
    "multimodal_audio_features",
    oracle="""
    SELECT doc_id,
           CAST(length(text) * 4 AS INT) AS n_samples,
           CAST(length(text) * 4 // 16 AS INT) AS duration_ms,
           CAST((ascii(substring(text, 1, 1)) * 129) % 32768 AS INT) AS peak
    FROM documents
    WHERE doc_id < 100
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature-extraction plumbing: binary payload -> sample count,
    duration, peak amplitude via an Arrow-batched ``mapInPandas`` kernel
    (stub decode — see ``audio_feature_batches``). Completes the
    decode / feature-extract / resize / frame-sample verb set over the
    binary-column modality plumbing; the oracle recomputes the stub
    arithmetic from the source text (ASCII fixture: byte == char).
    """
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    packed = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return packed.mapInPandas(audio_feature_batches, schema=AUDIO_SCHEMA)


# Kernels above ship to executors; serialize this module by value so the
# driver does not need the package importable on workers (see serde.py).
from dataengineeringutils_spark.serde import pickle_module_by_value  # noqa: E402

pickle_module_by_value(__name__)


SHARD_BYTES = 16384  # target shard payload size (WebDataset-style packing)
SHARD_BUCKET = 64  # docs per offset bucket in the two-phase running sum


@query(
    "multimodal_shard_manifest",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
    ),
    packed AS (
        SELECT doc_id, n_bytes,
               (SUM(n_bytes) OVER (ORDER BY doc_id) - n_bytes)
                   // {SHARD_BYTES} AS shard_id
        FROM sized
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM packed GROUP BY shard_id ORDER BY shard_id
    """,
)
def multimodal_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-manifest builder: greedy sequential packing of blob payloads
    into ~{SHARD_BYTES}-byte shards in ingest (doc_id) order — the
    WebDataset/tar-shard layout step every multimodal training pipeline
    runs before data loading; the manifest (shard → members, sizes,
    id range) is what the loader consumes.

    The exclusive running byte total assigns each blob a shard in ONE
    pass, via the repo's two-phase cut: per-bucket byte sums (bucket =
    doc_id div {SHARD_BUCKET}, order-preserving) make a tiny offsets
    frame; the per-doc window then runs per bucket with the broadcast
    offset added — no single-task global window at any corpus size.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.octet_length("text").cast("long").alias("n_bytes")
    )
    d = d.withColumn("bkt", F.expr(f"doc_id div {SHARD_BUCKET}"))
    bkt = d.groupBy("bkt").agg(F.sum("n_bytes").alias("bt"))
    w_b = Window.orderBy("bkt")
    offsets = bkt.withColumn(
        "off", F.coalesce(F.sum("bt").over(w_b) - F.col("bt"), F.lit(0))
    ).select("bkt", "off")
    w_doc = Window.partitionBy("bkt").orderBy("doc_id")
    packed = (
        d.join(F.broadcast(offsets), "bkt")
        .withColumn(
            "cum_before",
            F.col("off") + F.sum("n_bytes").over(w_doc) - F.col("n_bytes"),
        )
        .withColumn("shard_id", F.expr(f"cum_before div {SHARD_BYTES}"))
    )
    return (
        packed.groupBy("shard_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_bytes").cast("bigint").alias("shard_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard_id")
    )


@query(
    "multimodal_coverage_report",
    oracle="""
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(e.vec_id) AS BIGINT) AS n_with_embedding,
           CAST(COUNT(CASE WHEN d.n_chars >= 100 THEN 1 END) AS BIGINT)
               AS n_with_payload,
           CAST(COUNT(CASE WHEN e.vec_id IS NOT NULL
                            AND d.n_chars >= 100 THEN 1 END) AS BIGINT)
               AS n_complete
    FROM documents d
    LEFT JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.lang ORDER BY d.lang
    """,
)
def multimodal_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality COVERAGE report: per language, how many documents carry
    each modality (text payload above the minimum size, aligned
    embedding) and how many are COMPLETE across all of them — the
    sample-completeness audit a multimodal training pipeline runs
    before batch assembly (incomplete samples either route to
    single-modality training or block the delivery).

    One left join on the shared identity key (both sides hash-partition
    on it) + conditional rollup; adding a third modality is one more
    LEFT JOIN + flag, same single pass over the primary table.
    """
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings").select("vec_id")
    j = d.join(e, d.doc_id == e.vec_id, "left")
    has_payload = F.col("n_chars") >= 100
    return (
        j.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count("vec_id").cast("bigint").alias("n_with_embedding"),
            F.sum(has_payload.cast("long")).cast("bigint").alias("n_with_payload"),
            F.sum((F.col("vec_id").isNotNull() & has_payload).cast("long"))
            .cast("bigint")
            .alias("n_complete"),
        )
        .orderBy("lang")
    )


VLM_TILE = 64  # stub tile edge; tokens = tiles x TOKENS_PER_TILE + text
TOKENS_PER_TILE = 16
CONTEXT_BUDGET = 512


@query(
    "multimodal_token_budget",
    oracle=f"""
    WITH dims AS (
        SELECT doc_id, lang,
               CAST(16 + length(text) % 320 AS INT) AS w,
               CAST(16 + (length(text) * 7) % 240 AS INT) AS h,
               len(list_filter(string_split(text, ' '), t -> t <> ''))
                   AS text_tokens
        FROM documents
    ),
    budgeted AS (
        SELECT lang,
               text_tokens
               + CAST(CEIL(CAST(w AS DOUBLE) / {VLM_TILE}) AS BIGINT)
                 * CAST(CEIL(CAST(h AS DOUBLE) / {VLM_TILE}) AS BIGINT)
                 * {TOKENS_PER_TILE} AS seq_tokens
        FROM dims
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(seq_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(CASE WHEN seq_tokens > {CONTEXT_BUDGET} THEN 1 END)
                AS BIGINT) AS n_over_budget
    FROM budgeted GROUP BY lang ORDER BY lang
    """,
)
def multimodal_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VLM sequence-budget accounting: each sample's token cost = text
    tokens + image tiles × tokens-per-tile (the ViT-style patch/tile
    arithmetic every vision-language pipeline runs to size batches),
    rolled up per language with an over-context-budget count — the
    input to packing/truncation policy BEFORE any GPU sees a batch.

    Image dims come from the documented stub decode (the real kernel
    swaps in PIL; the tile arithmetic downstream is the production
    formula). Pure per-row integer/ceil arithmetic + one rollup.
    """
    d = table(spark, sf_dir, "documents")
    w = (16 + F.length("text") % 320).cast("int")
    h = (16 + (F.length("text") * 7) % 240).cast("int")
    text_tokens = F.size(F.filter(F.split("text", " "), lambda t: t != F.lit("")))
    tiles = (
        F.ceil(w.cast("double") / VLM_TILE).cast("bigint")
        * F.ceil(h.cast("double") / VLM_TILE).cast("bigint")
    )
    seq = text_tokens.cast("bigint") + tiles * TOKENS_PER_TILE
    return (
        d.select("lang", seq.alias("seq_tokens"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("seq_tokens").cast("bigint").alias("total_tokens"),
            F.sum((F.col("seq_tokens") > CONTEXT_BUDGET).cast("long"))
            .cast("bigint")
            .alias("n_over_budget"),
        )
        .orderBy("lang")
    )


@query(
    "multimodal_length_norm_corr",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(corr(CAST(d.n_chars AS DOUBLE),
                      {o_norm('e.embedding')}), 6) AS len_norm_corr,
           ROUND(regr_slope({o_norm('e.embedding')},
                            CAST(d.n_chars AS DOUBLE)), 8) AS slope
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def multimodal_length_norm_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal DRIFT diagnostic: correlation (and regression slope)
    between document length and embedding norm. A healthy encoder is
    near-uncorrelated; a strong correlation means the embedding space
    leaks raw length — retrieval then ranks long docs, not relevant
    ones — so this number is checked on every encoder/data refresh.

    One identity-key join + a single moment-aggregate pass (corr and
    regr_slope share the same mergeable moments); norms are the
    engine's sequential-double kernel, and the moment sums round at
    6/8 dp (the same contract `agg_regression`/`text_zipf_slope` pin).
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    e = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    j = d.join(e, d.doc_id == e.vec_id).select(
        F.col("n_chars").cast("double").alias("len_d"),
        l2_norm("embedding").alias("nrm"),
    )
    return j.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(F.corr("len_d", "nrm"), 6).alias("len_norm_corr"),
        F.round(F.regr_slope(F.col("nrm"), F.col("len_d")), 8).alias("slope"),
    )


PHASH_BITS = 60  # difference-hash bits; < 63 so the BIGINT never wraps


def _phash_kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: payload bytes -> 60-bit difference hash.

    dHash over the raw byte stream: sample 60 evenly spaced positions
    (p_i = i*(n-1) div 60), bit i = byte[p_i] > byte[p_i + 1]. On real
    images the same kernel runs on the decoded/downscaled pixel grid
    (PIL not in this container — the byte stream stands in for the pixel
    stream; sampling, comparison, and bit packing are the real thing).
    p_i + 1 <= n-1 holds for every n >= 2 since 59(n-1)/60 < n-1.
    """
    import numpy as np

    idx = np.arange(PHASH_BITS, dtype=np.int64)
    weights = np.int64(1) << idx
    for pdf in it:
        fps = []
        for payload in pdf["payload"]:
            a = np.frombuffer(payload, dtype=np.uint8)
            pos = (idx * (len(a) - 1)) // PHASH_BITS
            bits = a[pos] > a[pos + 1]
            fps.append(int((bits * weights).sum()))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "fp": np.array(fps, dtype=np.int64),
            }
        )


@query(
    "multimodal_phash_dedup",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, source,
               CAST(list_sum(list_transform(range(0, {PHASH_BITS}),
                   i -> CASE WHEN ascii(text[(i * (length(text) - 1))
                                            // {PHASH_BITS} + 1])
                               > ascii(text[(i * (length(text) - 1))
                                            // {PHASH_BITS} + 2])
                             THEN 1::BIGINT << i ELSE 0 END))
                    AS BIGINT) AS fp
        FROM documents
        WHERE length(text) >= 2
    )
    SELECT source,
           COUNT(*) AS n_assets,
           COUNT(DISTINCT fp) AS n_fingerprints,
           COUNT(*) - COUNT(DISTINCT fp) AS n_dupes,
           MIN(fp) AS min_fp,
           MAX(fp) AS max_fp
    FROM fp
    GROUP BY source
    """,
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash dedup over BINARY payloads: every asset gets a
    60-bit difference hash (dHash — Krawetz's gradient fingerprint) from
    an Arrow-batched numpy kernel, then exact-fingerprint grouping finds
    duplicate clusters (fp, n_docs, keeper = min doc_id).

    The multimodal analog of ``dedup_exact``: content-altering
    re-encodes (format shifts, metadata strips) change bytes but a
    pixel-derived dHash survives them; here the kernel consumes the raw
    byte stream (ASCII fixture ⇒ byte == char, which is what lets the
    oracle recompute the identical fingerprint from the text). Output:
    per-source dedup audit — asset count, distinct fingerprints, implied
    dupe count, fingerprint range (min/max pin the exact bit pattern).
    Plan: pack binary -> one mapInPandas pass emitting (doc_id, int64) —
    the payload never shuffles — then a group-by over 8-byte keys.
    At 100 TB: hash at scan speed, shuffle 8 bytes/asset.
    """
    d = table(spark, sf_dir, "documents").filter(F.length("text") >= 2)
    packed = d.select(
        "doc_id", "source", F.encode("text", "utf-8").alias("payload")
    )
    fps = packed.mapInPandas(
        _phash_kernel, "doc_id bigint, source string, fp bigint"
    )
    return fps.groupBy("source").agg(
        F.count("*").alias("n_assets"),
        F.count_distinct("fp").alias("n_fingerprints"),
        (F.count("*") - F.count_distinct("fp")).alias("n_dupes"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
    )


@query(
    "multimodal_bytes_dedup_exact",
    oracle="""
    WITH h AS (
        SELECT sha256(text) AS h, octet_length(encode(text)) AS nb
        FROM documents
    ),
    g AS (
        SELECT h, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(nb) AS BIGINT) AS nb
        FROM h GROUP BY h
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_assets,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_groups,
           CAST(SUM((n - 1) * nb) AS BIGINT) AS bytes_saved
    FROM g
    """,
)
def multimodal_bytes_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact byte-level asset dedup: content-address every payload with
    SHA-256 and group by digest — the storage-dedup pass run before any
    perceptual (pHash) stage, and the mechanism behind content-addressed
    asset stores (CAS). Fixture payloads are the UTF-8 document bytes;
    a real asset column swaps in the binary payload unchanged.

    Only 32-byte digests and byte counts shuffle — never payloads: at
    100 TB of assets the dedup aggregate moves gigabytes, not the
    corpus (the reason CAS dedups hash-first instead of byte-comparing).
    Output: asset/unique/dup-group counts and the bytes a deduplicated
    store saves. All exact integers.
    """
    d = table(spark, sf_dir, "documents")
    h = d.select(
        F.sha2(F.col("text").cast("binary"), 256).alias("h"),
        F.octet_length("text").alias("nb"),
    )
    g = h.groupBy("h").agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("nb").cast("bigint").alias("nb"),
    )
    return g.agg(
        F.sum("n").cast("bigint").alias("n_assets"),
        F.count("*").cast("bigint").alias("n_unique"),
        F.sum((F.col("n") > 1).cast("long")).cast("bigint").alias("n_dup_groups"),
        F.sum((F.col("n") - 1) * F.col("nb")).cast("bigint").alias("bytes_saved"),
    )
