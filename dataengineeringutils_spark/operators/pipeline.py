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
    near_dup_pairs_capped,
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
    # Production path reads the CAPPED pair artifact (stop-gram posting
    # cap detected on a 1/8 doc sample — identical pairs at fixture scale,
    # max shingle df 25 < 128, pinned by test_ngram_cap, but bounded k²
    # pair fan-out on boilerplate at 100 TB). The pair table is the
    # session-persisted artifact a production pipeline materializes once
    # and every downstream stage reads (near_dup_pairs_capped).
    pairs = near_dup_pairs_capped(spark, sf_dir).select("doc_a", "doc_b")
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


# Corpus-mixing targets in permille of the TOTAL corpus token count:
# en-heavy 24 %, 9 % for each other language = a 60 % global token budget.
MIX_PERMILLE = {"en": 240, "fr": 90, "es": 90, "de": 90, "zh": 90}


@query(
    "corpus_mixing_sample",
    oracle="""
    WITH toks AS (
        SELECT lang, doc_id,
               md5(CAST(doc_id AS VARCHAR)) AS h,
               len(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        FROM documents
    ),
    budget AS (
        SELECT lang,
               (SELECT SUM(tok) FROM toks)
                   * CASE lang WHEN 'en' THEN 240 ELSE 90 END // 1000 AS b
        FROM (SELECT DISTINCT lang FROM toks)
    ),
    running AS (
        SELECT t.lang, t.tok, b.b,
               SUM(t.tok) OVER (PARTITION BY t.lang ORDER BY t.h)
                   AS run_tok
        FROM toks t JOIN budget b ON t.lang = b.lang
    )
    SELECT lang,
           CAST(b AS BIGINT) AS token_budget,
           CAST(COUNT(CASE WHEN run_tok <= b THEN 1 END) AS BIGINT)
               AS docs_kept,
           CAST(COALESCE(SUM(CASE WHEN run_tok <= b THEN tok END), 0)
               AS BIGINT) AS tokens_kept
    FROM running GROUP BY lang, b ORDER BY lang
    """,
)
def corpus_mixing_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B215: language-mixing downsample to target token shares — the
    "data mixture" step before LLM pretraining: each language gets a
    token budget (permille of the whole corpus), filled by a
    DETERMINISTIC greedy prefix in md5(doc_id) order, so every engine
    and every rerun keeps the identical document set.

    Scale shape (the repo's two-phase cut pattern): the running-token
    prefix is NOT one window over all docs of a language (that would put
    an entire language's corpus in one task at 100 TB). Docs hash into
    256 buckets keyed by their md5 PREFIX — bucket order therefore
    refines md5 order — per-bucket token sums make a 256-row frame where
    the cheap running sum finds each bucket's starting offset; the
    per-doc window then runs per (lang, bucket) partition, 1/256th of a
    language each, and a doc is kept iff bucket_offset + within-bucket
    running ≤ budget. Identical keep-set to the single-window oracle.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        F.size(
            F.filter(F.split("text", " "), lambda t: t != F.lit(""))
        ).cast("long").alias("tok"),
    )
    permille = F.when(F.col("lang") == "en", F.lit(240)).otherwise(F.lit(90))
    total = toks.agg(F.sum("tok").alias("grand"))
    toks = (
        toks.crossJoin(F.broadcast(total))
        .withColumn("b", F.col("grand") * permille)
        .withColumn("b", F.expr("b div 1000"))
        .drop("grand")
    )
    bucketed = toks.withColumn("bkt", F.substring("h", 1, 2))
    bkt_sums = bucketed.groupBy("lang", "bkt").agg(F.sum("tok").alias("bt"))
    w_b = Window.partitionBy("lang").orderBy("bkt")
    offsets = bkt_sums.withColumn(
        "off", F.coalesce(F.sum("bt").over(w_b) - F.col("bt"), F.lit(0))
    ).select("lang", "bkt", "off")
    w_doc = Window.partitionBy("lang", "bkt").orderBy("h")
    run = (
        bucketed.join(F.broadcast(offsets), ["lang", "bkt"])
        .withColumn("run_tok", F.col("off") + F.sum("tok").over(w_doc))
    )
    keep = F.col("run_tok") <= F.col("b")
    return (
        run.groupBy("lang", "b")
        .agg(
            F.sum(keep.cast("long")).cast("bigint").alias("docs_kept"),
            F.coalesce(
                F.sum(F.when(keep, F.col("tok"))), F.lit(0)
            ).cast("bigint").alias("tokens_kept"),
        )
        .select(
            "lang",
            F.col("b").cast("bigint").alias("token_budget"),
            "docs_kept",
            "tokens_kept",
        )
        .orderBy("lang")
    )


@query(
    "dataset_split_holdout",
    oracle="""
    WITH assigned AS (
        SELECT doc_id, lang,
               CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id, lang,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                        AS UBIGINT) % 100 AS b
            FROM documents
        )
    )
    SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM assigned GROUP BY split, lang ORDER BY split, lang
    """,
)
def dataset_split_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10): each document's
    split comes from a hash of its IDENTITY (md5 of doc_id, bucket mod
    100), so membership is stable across reruns, engines, repartitions
    and corpus growth — an appended doc never moves existing docs
    between splits, the property `rand()`-based splits silently lack
    (and the reason eval contamination creeps into retrained models).

    Pure per-row codegen + one rollup; the same hash gate applied at
    read time filters any downstream job to its split with zero stored
    split column.
    """
    d = table(spark, sf_dir, "documents")
    b = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long") % 100
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("split", "lang")
    )


@query(
    "dataset_interleave_shards",
    oracle="""
    WITH ordered AS (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY doc_id ASC) AS rn
        FROM documents
    ),
    tagged AS (
        SELECT source, doc_id, n_chars,
               CAST((rn - 1) % 4 AS INT) AS shard
        FROM ordered
    )
    SELECT shard, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM tagged GROUP BY 1, 2
    """,
)
def dataset_interleave_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic round-robin SHARD INTERLEAVING: within each source,
    documents (in doc_id order) deal out to 4 shards like cards — so
    every shard sees every source in the same proportion and in a
    stable order. This is the training-data property that matters for
    data-parallel runs: each worker's shard is a stratified, unbiased
    sample of the mixture, and re-running the job yields byte-identical
    shards (rand()-free — resumable, diffable, cacheable).

    The per-source rank runs TWO-PHASE (windows.keyed_two_phase):
    ``source`` has a handful of values, so a naive keyed window would
    put a whole source's documents on one sorting task; instead rows
    bucket on cached doc_id range cuts, a tiny (source x bucket) count
    frame broadcasts rank offsets, and row_number sorts only bounded
    (source, bucket) partitions. The audit output is the shard x
    source grid (counts, char mass, id range) a packing job checks
    before writing. At 100 TB the same modulo gate becomes the
    shard-assignment column of the manifest (multimodal_shard_manifest)
    and the writer's partitionBy key.
    """
    from dataengineeringutils_spark.operators.windows import (
        bucket_expr,
        keyed_two_phase,
        sampled_cuts,
        table_rows,
    )

    d = table(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    cuts = sampled_cuts(spark, sf_dir, "doc_id_cuts", d, "doc_id")
    ranked = keyed_two_phase(
        d.withColumn("bkt", bucket_expr(F.col("doc_id"), cuts)),
        ["source"],
        [F.col("doc_id").asc()],
        "__rn",
        n_rows=table_rows(spark, sf_dir, "documents"),
    )
    tagged = ranked.select(
        "source",
        "doc_id",
        "n_chars",
        ((F.col("__rn") - 1) % 4).cast("int").alias("shard"),
    )
    return tagged.groupBy("shard", "source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


TOKEN_BUDGET = 100_000


@query(
    "corpus_token_budget_allocation",
    oracle=f"""
    WITH counts AS (
        SELECT source,
               CAST(SUM(len(list_filter(string_split(text, ' '),
                                        t -> t <> ''))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM counts),
    quota AS (
        SELECT source, n_tokens,
               CAST((n_tokens * {TOKEN_BUDGET}) // t AS BIGINT) AS base,
               (n_tokens * {TOKEN_BUDGET}) % t AS rem
        FROM counts CROSS JOIN tot
    ),
    ranked AS (
        SELECT source, n_tokens, base,
               ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rr,
               CAST({TOKEN_BUDGET} AS BIGINT)
                 - (SELECT CAST(SUM(base) AS BIGINT) FROM quota) AS leftover
        FROM quota
    )
    SELECT source, n_tokens,
           CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
               AS allocated_tokens
    FROM ranked
    """,
)
def corpus_token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture BUDGETING: allocate a fixed token budget across
    sources proportionally to their token mass using the
    largest-remainder (Hamilton) method — integer quotas that sum
    EXACTLY to the budget, deterministic tie-breaks, no float drift
    (floor quotas + distribute the leftover to the largest remainders).
    This is the planning step before ``corpus_mixing_sample`` draws the
    actual documents; the same arithmetic apportions shard counts,
    sampling quotas, and eval-slice sizes.

    One token-count aggregate per source; the apportionment runs on the
    |sources|-row frame in exact integer arithmetic shared with the
    oracle (the remainder comparison is integer: n*B mod t, never a
    float share).
    """
    from dataengineeringutils_spark.operators.dedup import tokens_col

    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.sum(F.size(tokens_col())).cast("bigint").alias("n_tokens")
    )
    tot = counts.agg(F.sum("n_tokens").cast("bigint").alias("t"))
    quota = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.expr(f"CAST((n_tokens * {TOKEN_BUDGET}) div t AS BIGINT)").alias(
            "base"
        ),
        F.expr(f"(n_tokens * {TOKEN_BUDGET}) % t").alias("rem"),
    )
    base_sum = quota.agg(F.sum("base").cast("bigint").alias("bs"))
    w = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    ranked = quota.crossJoin(F.broadcast(base_sum)).select(
        "source",
        "n_tokens",
        "base",
        F.row_number().over(w).alias("rr"),
        (F.lit(TOKEN_BUDGET).cast("bigint") - F.col("bs")).alias("leftover"),
    )
    return ranked.select(
        "source",
        "n_tokens",
        F.expr(
            "CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("allocated_tokens"),
    )


@query(
    "dataset_epoch_shuffle_order",
    oracle="""
    SELECT epoch, pos, doc_id
    FROM (
        SELECT e.epoch, d.doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY e.epoch
                   ORDER BY md5(CAST(e.epoch AS VARCHAR) || ':'
                                || CAST(d.doc_id AS VARCHAR)),
                            d.doc_id
               ) AS INT) AS pos
        FROM documents d
        CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS epoch) e
    )
    WHERE pos <= 10
    """,
)
def dataset_epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training shuffle: each epoch orders the
    corpus by an identity hash SEEDED with the epoch number, and the op
    emits the first 10 positions of epochs 0-2 — reproducible epoch
    ordering without rand() (resumable mid-epoch from a position, byte-
    identical across reruns and engines, and different epochs genuinely
    decorrelate because the seed enters the hash, not an offset).

    The rank is per-epoch top-K (TakeOrderedAndProject per epoch key —
    the corpus never globally sorts for the PREVIEW; a full epoch
    materialization would instead write files ordered by the same key,
    which IS a sort, paid once per epoch by design).
    """
    d = table(spark, sf_dir, "documents").select("doc_id")
    epochs = F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("epoch")
    crossed = d.select("doc_id", epochs)
    w = Window.partitionBy("epoch").orderBy(
        F.md5(
            F.concat_ws(
                ":",
                F.col("epoch").cast("string"),
                F.col("doc_id").cast("string"),
            )
        ),
        F.col("doc_id"),
    )
    return (
        crossed.select(
            "epoch", "doc_id", F.row_number().over(w).cast("int").alias("pos")
        )
        .filter(F.col("pos") <= 10)
        .select("epoch", "pos", "doc_id")
    )

# Temperature-sampling exponents. Restricted to quarter powers so both
# engines compute the weight base via nested SQRT — IEEE-754 requires
# sqrt to be correctly rounded, so the doubles are bit-identical across
# Spark and DuckDB; a general POWER(x, 0.3) is NOT correctly rounded and
# may differ in the last ulp between libm implementations.
TEMP_ALPHAS = ((25, "SQRT(SQRT(CAST(n_tokens AS DOUBLE)))"),
               (50, "SQRT(CAST(n_tokens AS DOUBLE))"),
               (100, "CAST(n_tokens AS DOUBLE)"))

_TEMP_GRID_SQL = " UNION ALL ".join(
    f"SELECT source, n_tokens, {a} AS alpha_pct, {expr} AS w_raw FROM counts"
    for a, expr in TEMP_ALPHAS
)


@query(
    "dataset_temperature_sampling_weights",
    oracle=f"""
    WITH counts AS (
        SELECT source,
               CAST(SUM(len(list_filter(string_split(text, ' '),
                                        t -> t <> ''))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    grid AS ({_TEMP_GRID_SQL}),
    norm AS (
        SELECT source, n_tokens, alpha_pct, w_raw,
               SUM(w_raw) OVER (PARTITION BY alpha_pct) AS z,
               SUM(n_tokens) OVER (PARTITION BY alpha_pct) AS m
        FROM grid
    )
    SELECT source, CAST(alpha_pct AS INT) AS alpha_pct, n_tokens,
           ROUND(w_raw / z, 6) AS weight,
           ROUND((w_raw / z) / (CAST(n_tokens AS DOUBLE) / m), 6)
               AS upsample_factor
    FROM norm
    """,
)
def dataset_temperature_sampling_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-based mixture weights per source: w_s ∝ tokens_s^α
    for α ∈ {0.25, 0.5, 1.0} — the multilingual/multi-source sampling
    rule (XLM-R-style α-sampling) that upweights small sources without
    letting any source dominate; ``upsample_factor`` (weight over
    natural share) is the repetition multiplier each source would see
    at that temperature.

    One token-count aggregate collapses the corpus to |sources| rows;
    the α-grid is a 3-way union of that broadcastable frame and the
    normalization is a |sources×3|-row window. Exactness: α powers are
    nested SQRT (correctly rounded per IEEE-754, unlike general POWER),
    so both engines round identical doubles.
    """
    from dataengineeringutils_spark.operators.dedup import tokens_col

    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.sum(F.size(tokens_col())).cast("bigint").alias("n_tokens")
    )
    grid = None
    for a, expr in TEMP_ALPHAS:
        part = counts.select(
            "source",
            "n_tokens",
            F.lit(a).cast("int").alias("alpha_pct"),
            F.expr(expr).alias("w_raw"),
        )
        grid = part if grid is None else grid.unionByName(part)
    wz = Window.partitionBy("alpha_pct")
    return grid.select(
        "source",
        "alpha_pct",
        "n_tokens",
        F.round(F.col("w_raw") / F.sum("w_raw").over(wz), 6).alias("weight"),
        F.round(
            (F.col("w_raw") / F.sum("w_raw").over(wz))
            / (
                F.col("n_tokens").cast("double")
                / F.sum("n_tokens").over(wz)
            ),
            6,
        ).alias("upsample_factor"),
    )


@query(
    "dataset_dedup_aware_epoch_plan",
    oracle="""
    WITH fam AS (
        SELECT source, md5(text) AS h,
               CAST(COUNT(*) AS BIGINT) AS copies,
               CAST(MIN(len(list_filter(string_split(text, ' '),
                                        t -> t <> ''))) AS BIGINT) AS tok
        FROM documents GROUP BY source, md5(text)
    )
    SELECT source,
           CAST(SUM(copies) AS BIGINT) AS docs,
           CAST(COUNT(*) AS BIGINT) AS uniq_docs,
           CAST(SUM(copies * tok) AS BIGINT) AS raw_tokens,
           CAST(SUM(tok) AS BIGINT) AS uniq_tokens,
           ROUND(1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(copies), 6)
               AS dup_doc_ratio,
           ROUND(CAST(SUM(copies * tok) AS DOUBLE) / SUM(tok), 6)
               AS implied_epochs
    FROM fam GROUP BY source
    """,
)
def dataset_dedup_aware_epoch_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dedup-aware epoch planning per source: exact-duplicate families
    (md5 of the text) collapse the corpus to unique documents, and
    ``implied_epochs`` = raw tokens over unique tokens is the effective
    repetition a trainer already gets from duplication BEFORE any
    explicit multi-epoch schedule — the number to subtract when sizing
    repeats, next to ``dedup_exact``'s removal view.

    Families form in one (source, digest) hash aggregate carrying only
    the digest and a token count (MIN over identical texts — copies
    tokenize identically); the per-source plan is a second |families|→
    |sources| collapse. Text never shuffles, docs never sort.
    """
    from dataengineeringutils_spark.operators.dedup import tokens_col

    d = table(spark, sf_dir, "documents")
    fam = d.groupBy(
        "source", F.md5(F.col("text").cast("binary")).alias("h")
    ).agg(
        F.count("*").cast("bigint").alias("copies"),
        F.min(F.size(tokens_col())).cast("bigint").alias("tok"),
    )
    return fam.groupBy("source").agg(
        F.sum("copies").cast("bigint").alias("docs"),
        F.count("*").cast("bigint").alias("uniq_docs"),
        F.sum(F.col("copies") * F.col("tok")).cast("bigint").alias(
            "raw_tokens"
        ),
        F.sum("tok").cast("bigint").alias("uniq_tokens"),
        F.round(
            F.lit(1.0)
            - F.count("*").cast("double") / F.sum("copies"),
            6,
        ).alias("dup_doc_ratio"),
        F.round(
            F.sum(F.col("copies") * F.col("tok")).cast("double")
            / F.sum("tok"),
            6,
        ).alias("implied_epochs"),
    )


@query(
    "dataset_padding_waste",
    oracle="""
    WITH toks AS (
        SELECT len(list_filter(string_split(text, ' '), t -> t <> ''))
            AS tok
        FROM documents
    ),
    grid AS (SELECT UNNEST([128, 256, 512]) AS cap),
    scored AS (
        SELECT cap,
               LEAST(tok, cap) AS kept,
               CASE WHEN tok > cap THEN tok - cap ELSE 0 END AS truncated,
               cap - LEAST(tok, cap) AS padding
        FROM toks CROSS JOIN grid
    )
    SELECT cap AS context_len,
           CAST(SUM(kept) AS BIGINT) AS tokens_kept,
           CAST(SUM(truncated) AS BIGINT) AS tokens_truncated,
           ROUND(CAST(SUM(truncated) AS DOUBLE)
                 / (SUM(kept) + SUM(truncated)), 6) AS truncation_loss,
           ROUND(CAST(SUM(padding) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE) * cap), 6) AS padding_waste
    FROM scored GROUP BY cap
    """,
)
def dataset_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTEXT-LENGTH economics: at caps of 128/256/512 tokens, how much
    of the corpus is TRUNCATED away (long docs cut at the cap) vs how
    much compute is PADDED away (short docs in pad-to-cap batches) —
    the two losses that move in opposite directions as the cap grows,
    and the table that justifies sequence PACKING
    (``text_pack_sequences`` drives padding_waste to ~0) or a
    length-bucketed loader over naive fixed-length batching.

    One token-count projection crossed with a 3-row cap grid, collapsed
    map-side to exact integer sums per cap — the corpus scans once.
    """
    from dataengineeringutils_spark.operators.dedup import tokens_col

    d = table(spark, sf_dir, "documents")
    toks = d.select(F.size(tokens_col()).cast("bigint").alias("tok"))
    grid = F.explode(F.array(*[F.lit(c) for c in (128, 256, 512)])).alias(
        "cap"
    )
    scored = toks.select("tok", grid).select(
        "cap",
        F.least("tok", "cap").alias("kept"),
        F.when(F.col("tok") > F.col("cap"), F.col("tok") - F.col("cap"))
        .otherwise(0)
        .alias("truncated"),
        (F.col("cap") - F.least("tok", "cap")).alias("padding"),
    )
    return scored.groupBy("cap").agg(
        F.sum("kept").cast("bigint").alias("tokens_kept"),
        F.sum("truncated").cast("bigint").alias("tokens_truncated"),
        F.round(
            F.sum("truncated").cast("double")
            / (F.sum("kept") + F.sum("truncated")),
            6,
        ).alias("truncation_loss"),
        F.round(
            F.sum("padding").cast("double")
            / (F.count("*").cast("double") * F.first("cap")),
            6,
        ).alias("padding_waste"),
    ).withColumnRenamed("cap", "context_len")
