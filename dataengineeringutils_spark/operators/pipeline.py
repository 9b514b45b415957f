"""End-to-end corpus-cleaning pipeline — the composed training-data path.

One declared operator chains the stages a RefinedWeb/FineWeb-style corpus
pipeline runs over raw documents: exact dedup (keep-first) -> quality
filter (length + type-token ratio) -> near-duplicate removal (exact-Jaccard
pairs, keep the lower doc_id) -> per-language funnel report. Every stage is
SQL-expressible, so unlike most pipeline code this one is oracle-checked
end to end.

Scale: the funnel is ONE pass over the corpus plus the pair join from
``dedup_ngram_jaccard`` (whose output is near-dup pairs only — tiny);
stage flags are computed as expressions, never materialized as separate
corpus copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineeringutils_spark.operators.dedup import (
    NGRAM_ORACLE,
    hot_shingle_stoplist,
    ngram_jaccard_pairs,
    shingle_rows,
    tokens_col,
)
from dataengineeringutils_spark.registry import query
from dataengineeringutils_spark.tables import table

MIN_TOKENS = 25
MIN_TTR = 0.35


@query(
    "pipeline_clean_corpus",
    oracle=f"""
    WITH flags AS (
        SELECT doc_id,
               lang,
               ROW_NUMBER() OVER (PARTITION BY TRIM(text) ORDER BY doc_id) = 1
                   AS exact_keep,
               len(toks) >= {MIN_TOKENS}
                   AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                       >= {MIN_TTR}
                   AS quality_ok
        FROM (
            SELECT doc_id, lang, text,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks
            FROM documents
        )
    ),
    pairs AS (
        {NGRAM_ORACLE}
    ),
    neardup_drops AS (
        SELECT DISTINCT p.doc_b AS doc_id
        FROM pairs p
        JOIN flags fa ON p.doc_a = fa.doc_id AND fa.exact_keep AND fa.quality_ok
        JOIN flags fb ON p.doc_b = fb.doc_id AND fb.exact_keep AND fb.quality_ok
    )
    SELECT f.lang,
           COUNT(*) AS n_raw,
           COUNT(*) FILTER (f.exact_keep) AS n_exact,
           COUNT(*) FILTER (f.exact_keep AND f.quality_ok) AS n_quality,
           COUNT(*) FILTER (f.exact_keep AND f.quality_ok AND d.doc_id IS NULL)
               AS n_final
    FROM flags f
    LEFT JOIN neardup_drops d ON f.doc_id = d.doc_id
    GROUP BY f.lang
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language cleaning funnel: raw -> exact-dedup -> quality ->
    near-dup-removed counts.

    Near-dup removal keeps the LOWER doc_id of each surviving exact-Jaccard
    pair — the single-pass approximation most production pipelines use
    (full transitive closure is ``dedup_connected_components``; on shallow
    near-dup components the two agree except inside chains A~B~C where
    A!~C).
    """
    d = table(spark, sf_dir, "documents")
    toks = tokens_col()
    w = Window.partitionBy(F.trim(F.col("text"))).orderBy("doc_id")
    flags = d.select(
        "doc_id",
        "lang",
        (F.row_number().over(w) == 1).alias("exact_keep"),
        (
            (F.size(toks) >= MIN_TOKENS)
            & (
                F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
                >= MIN_TTR
            )
        ).alias("quality_ok"),
    )
    surviving = flags.filter(F.col("exact_keep") & F.col("quality_ok")).select(
        "doc_id"
    )
    # Production path runs CAPPED shingle blocking (stop-gram posting cap,
    # detected on a 1/8 doc sample): identical pairs at fixture scale (max
    # shingle df 25 < 128, pinned by test_ngram_cap) but bounded k² pair
    # fan-out on boilerplate at 100 TB.
    pairs = ngram_jaccard_pairs(
        shingle_rows(spark, sf_dir),
        stop_shingles=hot_shingle_stoplist(spark, sf_dir),
    ).select("doc_a", "doc_b")
    drops = (
        pairs.join(surviving.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(surviving.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .select(F.col("doc_b").alias("drop_id"))
        .distinct()
    )
    funnel = flags.join(drops, flags.doc_id == drops.drop_id, "left")
    keep_final = (
        F.col("exact_keep") & F.col("quality_ok") & F.col("drop_id").isNull()
    )
    return funnel.groupBy("lang").agg(
        F.count("*").alias("n_raw"),
        F.sum(F.col("exact_keep").cast("long")).alias("n_exact"),
        F.sum((F.col("exact_keep") & F.col("quality_ok")).cast("long")).alias(
            "n_quality"
        ),
        F.sum(keep_final.cast("long")).alias("n_final"),
    )
