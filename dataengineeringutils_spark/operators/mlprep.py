"""ML feature-preparation operators: scaling, encoding, hashing, chunking.

The feature-engineering steps a training pipeline runs between the
warehouse and the trainer, each as a declarative Catalyst plan:

- ``ml_feature_scale``    per-group min-max + z-score standardization —
                          group stats via ONE aggregate, broadcast back.
- ``ml_one_hot_encode``   fixed-vocabulary indicator columns (schema is
                          DECLARED, never inferred from data — dynamic
                          pivot would make the output schema a function
                          of the data, poison for a training contract).
- ``ml_feature_hashing``  the hashing trick: token -> stable bucket via
                          md5 prefix, counts per (lang, bucket).
- ``text_chunk_spans``    RAG-style overlapping token windows with
                          deterministic md5 content ids.

Scale notes: scaling stats are a |groups|-row broadcast (never a window
over the fact table); one-hot is pure per-row codegen; feature hashing
shuffles (lang, bucket) partial counts only; chunking is a per-row
explode with no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineeringutils_spark.operators.dedup import tokens_col
from dataengineeringutils_spark.registry import query
from dataengineeringutils_spark.tables import table

# Shared arithmetic for ml_feature_scale: the mean/variance formulas are
# single strings so the Spark expression and the DuckDB oracle parse THE
# SAME TEXT — identical IEEE op order, bit-identical doubles. Sums are
# exact (DECIMAL) up to the final double conversion.
_MEAN = "CAST(s1 AS DOUBLE) / n"
_VAR = f"(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * ({_MEAN})) / (n - 1)"


@query(
    "ml_feature_scale",
    oracle=f"""
    WITH stats AS (
        SELECT o_orderpriority,
               COUNT(*) AS n,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s1,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))
                   * CAST(o_totalprice AS DECIMAL(18,2))) AS s2,
               MIN(o_totalprice) AS mn,
               MAX(o_totalprice) AS mx
        FROM orders
        GROUP BY o_orderpriority
    )
    SELECT o.o_orderkey,
           o.o_orderpriority AS priority,
           o.o_totalprice AS price,
           ROUND((o.o_totalprice - mn) / (mx - mn), 6) AS minmax,
           ROUND((o.o_totalprice - ({_MEAN})) / SQRT({_VAR}), 6) AS zscore
    FROM orders o JOIN stats s ON o.o_orderpriority = s.o_orderpriority
    WHERE o.o_orderkey % 101 = 0
    """,
)
def ml_feature_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max and z-score feature scaling of order totals per priority
    class (a 1/101 keyed sample of rows is returned; stats use ALL rows).

    Plan: one aggregate computes per-group (n, Σx, Σx², min, max) with
    exact DECIMAL sums (order-independent — a double Σx² would differ
    between engines and between runs), then broadcasts the |groups|-row
    stats frame back onto the fact rows. The alternative — window
    functions over the full table — would shuffle every row into
    per-group partitions; this shape shuffles only the group partials
    and scales to any group cardinality. Exactness: sums are DECIMAL
    until the final double conversion; mean/variance are evaluated from
    the same expression text on both engines, so the 6-dp rounding sits
    on identical doubles.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    dp = F.col("o_totalprice").cast("decimal(18,2)")
    stats = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(dp).alias("s1"),
        F.sum(dp * dp).alias("s2"),
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
    )
    sampled = o.filter(F.col("o_orderkey") % 101 == 0)
    return sampled.join(F.broadcast(stats), "o_orderpriority").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("price"),
        F.expr("ROUND((o_totalprice - mn) / (mx - mn), 6)").alias("minmax"),
        F.expr(
            f"ROUND((o_totalprice - ({_MEAN})) / SQRT({_VAR}), 6)"
        ).alias("zscore"),
    )


ONE_HOT_PRIORITIES = (
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
)


@query(
    "ml_one_hot_encode",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pri_1,
           CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS pri_2,
           CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END AS pri_3,
           CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END
               AS pri_4,
           CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS pri_5,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS st_f,
           CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS st_o,
           CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS st_p
    FROM orders
    WHERE o_orderkey % 101 = 0
    """,
)
def ml_one_hot_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-hot encoding of order priority and status against a DECLARED
    category vocabulary (1/101 keyed sample).

    The vocabulary is a constant, not discovered via ``pivot()``:
    data-driven pivot makes the output schema depend on which categories
    happen to appear in this batch — a training-data contract violation
    (feature dimension drift between shards/days). Unknown categories
    encode as all-zeros, the standard handle-invalid='keep-reference'
    behavior. Pure per-row codegen; zero shuffles.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 101 == 0)
    pri_cols = [
        F.when(F.col("o_orderpriority") == c, 1).otherwise(0).alias(f"pri_{i}")
        for i, c in enumerate(ONE_HOT_PRIORITIES, start=1)
    ]
    st_cols = [
        F.when(F.col("o_orderstatus") == s, 1).otherwise(0).alias(f"st_{s.lower()}")
        for s in ("F", "O", "P")
    ]
    return o.select("o_orderkey", *pri_cols, *st_cols)


N_HASH_BUCKETS = 16


@query(
    "ml_feature_hashing",
    oracle=f"""
    SELECT lang,
           ('0x' || substr(md5(tok), 1, 6))::BIGINT % {N_HASH_BUCKETS}
               AS bucket,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT tok) AS n_distinct
    FROM (
        SELECT lang,
               UNNEST(list_filter(string_split(text, ' '), t -> t <> ''))
                   AS tok
        FROM documents
    )
    GROUP BY 1, 2
    """,
)
def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: every token maps to one of a FIXED number of
    feature buckets via a stable content hash — bag-of-words in bounded
    dimension with no vocabulary to build, ship, or keep in sync
    (Weinberger et al. 2009). Output: per (lang, bucket) token counts.

    The bucket hash is the first 24 bits of md5 — engine-portable (the
    oracle computes the identical bucket), stable across runs/shards,
    and uniform. Plan: explode -> partial-agg -> one shuffle of
    (lang, bucket) partials — at most |langs| x 16 rows move.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select("lang", F.explode(tokens_col()).alias("tok"))
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 6), 16, 10).cast("bigint")
        % N_HASH_BUCKETS
    )
    return toks.groupBy("lang", bucket.alias("bucket")).agg(
        F.count("*").alias("n_tokens"),
        F.count_distinct("tok").alias("n_distinct"),
    )


CHUNK_TOKENS = 40
CHUNK_STRIDE = 30


@query(
    "text_chunk_spans",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    c AS (
        SELECT doc_id, toks,
               UNNEST(range(0, len(toks), {CHUNK_STRIDE})) AS start
        FROM t
        WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(start // {CHUNK_STRIDE} AS INT) AS chunk_idx,
           CAST(start AS INT) AS start_tok,
           CAST(LEAST({CHUNK_TOKENS}, len(toks) - start) AS INT) AS len_tok,
           md5(array_to_string(
               toks[start + 1 : start + LEAST({CHUNK_TOKENS},
                                              len(toks) - start)],
               ' ')) AS chunk_md5
    FROM c
    """,
)
def text_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style document chunking: overlapping token windows
    (40 tokens, stride 30) with per-chunk content ids.

    Emits (doc_id, chunk_idx, start_tok, len_tok, chunk_md5) — the
    manifest a retrieval index builds from, with the md5 as the stable
    chunk id for incremental re-embedding (chunk unchanged -> id
    unchanged -> embedding reused). Pure per-row explode: no shuffle,
    no state; at 100 TB this runs at scan speed and the ~1.33x token
    amplification (40/30 overlap) is the only cost.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col().alias("toks")
    )
    n = F.size("toks")
    d = d.filter(n > 0).select(
        "doc_id",
        "toks",
        F.posexplode(
            F.sequence(F.lit(0), n - 1, F.lit(CHUNK_STRIDE))
        ).alias("chunk_idx", "start"),
    )
    ln = F.least(F.lit(CHUNK_TOKENS), F.size("toks") - F.col("start"))
    return d.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("start").cast("int").alias("start_tok"),
        ln.cast("int").alias("len_tok"),
        F.md5(
            F.concat_ws(" ", F.slice("toks", F.col("start") + 1, ln))
        ).alias("chunk_md5"),
    )


@query(
    "dataset_balance_classes",
    oracle="""
    WITH stats AS (
        SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ),
    k AS (
        SELECT lang, n_docs,
               CAST(CEIL(CAST(n_docs AS DOUBLE)
                         / (SELECT MIN(n_docs) FROM stats)) AS BIGINT)
                   AS keep_every
        FROM stats
    ),
    kept AS (
        SELECT d.lang, COUNT(*) AS n_kept
        FROM documents d JOIN k USING (lang)
        WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT
              % k.keep_every = 0
        GROUP BY d.lang
    )
    SELECT lang, n_docs, keep_every, COALESCE(n_kept, 0) AS n_kept
    FROM k LEFT JOIN kept USING (lang)
    """,
)
def dataset_balance_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling plan: each language class keeps every
    k-th document (k = ceil(class_size / minority_size)) selected by an
    IDENTITY HASH of doc_id — so the sample is reproducible across runs,
    shards, and engines, and a re-run after new data arrives keeps the
    same documents it kept before (± genuinely new ones). The
    ``sample(fraction)`` alternative is seed-AND-partitioning dependent:
    a repartition silently changes which rows a training set contains.

    Plan: one class-stats aggregate (tiny), the minority size via a
    1-row broadcast, the keep-gate as per-row codegen under a broadcast
    join — the fact table is never shuffled.
    """
    d = table(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    mn = stats.agg(F.min("n_docs").alias("mn"))
    k = stats.crossJoin(F.broadcast(mn)).select(
        "lang",
        "n_docs",
        F.expr(
            "CAST(CEIL(CAST(n_docs AS DOUBLE) / mn) AS BIGINT)"
        ).alias("keep_every"),
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("bigint")
    kept = (
        d.join(F.broadcast(k), "lang")
        .filter(bucket % F.col("keep_every") == 0)
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
    )
    return k.join(F.broadcast(kept), "lang", "left").select(
        "lang",
        "n_docs",
        "keep_every",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )


SHARD_TOKEN_BUDGET = 2000
CHUNK_MIN_TTR = 0.3


@query(
    "pipeline_chunk_pack_shards",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    chunks AS (
        SELECT doc_id, lang,
               CAST(start // {CHUNK_STRIDE} AS INT) AS chunk_idx,
               CAST(LEAST({CHUNK_TOKENS}, len(toks) - start) AS INT)
                   AS len_tok,
               md5(array_to_string(
                   toks[start + 1 : start + LEAST({CHUNK_TOKENS},
                                                  len(toks) - start)],
                   ' ')) AS chunk_md5
        FROM (
            SELECT doc_id, lang, toks,
                   UNNEST(range(0, len(toks), {CHUNK_STRIDE})) AS start
            FROM t
            WHERE len(toks) > 0
                  AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                      >= {CHUNK_MIN_TTR}
        )
    ),
    surv AS (
        SELECT lang, doc_id, chunk_idx, len_tok
        FROM chunks
        QUALIFY ROW_NUMBER() OVER (PARTITION BY chunk_md5
                                   ORDER BY doc_id, chunk_idx) = 1
    ),
    packed AS (
        SELECT lang,
               CAST((SUM(len_tok) OVER (PARTITION BY lang
                                        ORDER BY doc_id, chunk_idx)
                     - len_tok) // {SHARD_TOKEN_BUDGET} AS INT) AS shard,
               len_tok
        FROM surv
    )
    SELECT lang, shard,
           COUNT(*) AS n_chunks,
           CAST(SUM(len_tok) AS BIGINT) AS n_tokens
    FROM packed
    GROUP BY lang, shard
    """,
)
def pipeline_chunk_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data EXPORT pipeline end to end: quality
    gate (type-token ratio) → overlapping chunking (40/30) → exact chunk
    dedup (md5 keep-first — cross-document boilerplate chunks collapse
    here) → greedy shard packing to a 2000-token budget per language →
    the shard manifest (lang, shard, n_chunks, n_tokens) a trainer's
    data loader consumes.

    Every stage is declarative and partition-friendly: chunking explodes
    at scan speed; dedup shuffles 16-byte md5 keys; packing is a running
    token sum PARTITIONED BY LANGUAGE (never a global window — shards
    are language-local by design, which is also what keeps the sort
    bounded at 100 TB; a deterministic (doc_id, chunk_idx) order makes
    packing reproducible run to run). All counts are exact integers.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens_col().alias("toks")
    )
    n = F.size("toks")
    quality = d.filter(
        (n > 0)
        & (F.size(F.array_distinct("toks")).cast("double") / n >= CHUNK_MIN_TTR)
    )
    exploded = quality.select(
        "doc_id",
        "lang",
        "toks",
        F.posexplode(
            F.sequence(F.lit(0), n - 1, F.lit(CHUNK_STRIDE))
        ).alias("chunk_idx", "start"),
    )
    ln = F.least(F.lit(CHUNK_TOKENS), F.size("toks") - F.col("start"))
    chunks = exploded.select(
        "doc_id",
        "lang",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        ln.cast("int").alias("len_tok"),
        F.md5(
            F.concat_ws(" ", F.slice("toks", F.col("start") + 1, ln))
        ).alias("chunk_md5"),
    )
    w_dedup = Window.partitionBy("chunk_md5").orderBy("doc_id", "chunk_idx")
    surv = (
        chunks.withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
        .select("lang", "doc_id", "chunk_idx", "len_tok")
    )
    w_pack = Window.partitionBy("lang").orderBy("doc_id", "chunk_idx")
    packed = surv.select(
        "lang",
        F.floor(
            (F.sum("len_tok").over(w_pack) - F.col("len_tok"))
            / SHARD_TOKEN_BUDGET
        )
        .cast("int")
        .alias("shard"),
        "len_tok",
    )
    return packed.groupBy("lang", "shard").agg(
        F.count("*").alias("n_chunks"),
        F.sum("len_tok").cast("bigint").alias("n_tokens"),
    )


_JS_TERM = (
    # pa = 0 (source has no mass in the bucket) is a REAL term of JS
    # divergence, not a droppable cell: the pb half degenerates to
    # 0.5 * pb * log2(pb / (pb/2)) = 0.5 * pb. (pb = 0 with pa > 0 is
    # impossible — the global mixture includes every source.)
    "CASE WHEN pa = 0 THEN 0.5 * pb ELSE "
    "0.5 * (pa * log2(pa / ((pa + pb) / 2)))"
    " + 0.5 * (pb * log2(pb / ((pa + pb) / 2))) END"
)


@query(
    "text_source_js_divergence",
    oracle=f"""
    WITH tok AS (
        SELECT source,
               ('0x' || substr(md5(tok), 1, 6))::BIGINT % {N_HASH_BUCKETS}
                   AS b
        FROM (
            SELECT source,
                   UNNEST(list_filter(string_split(text, ' '), t -> t <> ''))
                       AS tok
            FROM documents
        )
    ),
    per AS (SELECT source, b, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    stot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS t
             FROM per GROUP BY source),
    gl AS (SELECT b, CAST(SUM(c) AS BIGINT) AS g FROM per GROUP BY b),
    gtot AS (SELECT CAST(SUM(g) AS BIGINT) AS gt FROM gl),
    grid AS (
        SELECT s.source, s.t, r.range AS b
        FROM stot s CROSS JOIN range({N_HASH_BUCKETS}) r
    ),
    terms AS (
        SELECT gr.source,
               CAST(COALESCE(p.c, 0) AS DOUBLE) / gr.t AS pa,
               CAST(COALESCE(g.g, 0) AS DOUBLE)
                   / (SELECT gt FROM gtot) AS pb
        FROM grid gr
        LEFT JOIN per p ON p.source = gr.source AND p.b = gr.b
        LEFT JOIN gl g ON g.b = gr.b
    )
    SELECT source, ROUND(SUM({_JS_TERM}), 4) AS js_div
    FROM terms
    GROUP BY source
    """,
)
def text_source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-drift ranking: Jensen-Shannon divergence of each SOURCE's
    token distribution against the whole corpus, measured over the
    16-dimension hashed-feature space (``ml_feature_hashing``'s buckets)
    — which source is least like the rest, the triage signal when a
    crawl snapshot shifts.

    Hashed buckets, not raw tokens, on purpose: per-token JS sums
    thousands of libm log2 terms whose last-ulp engine differences
    accumulate past any rounding grid; 16 buckets keep the float noise
    ~1e-15 against a 1e-4 grid (and the drift signal survives hashing —
    that is the hashing trick's point). Terms cover the FULL
    source x bucket grid: a bucket where a source has zero mass still
    contributes 0.5 * pb — exactly the term that surfaces the
    most-shifted sources this ranking exists to find. Counts are exact
    integers end to end; one token explode feeds every aggregate; the
    grid is |sources| x 16 rows, metadata-sized at any corpus scale.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(tokens_col()).alias("tok"))
    b = (
        F.conv(F.substring(F.md5("tok"), 1, 6), 16, 10).cast("bigint")
        % N_HASH_BUCKETS
    )
    per = toks.groupBy("source", b.alias("b")).agg(F.count("*").alias("c"))
    stot = per.groupBy("source").agg(F.sum("c").alias("t"))
    gl = per.groupBy("b").agg(F.sum("c").alias("g"))
    gtot = gl.agg(F.sum("g").alias("gt"))
    buckets = spark.range(N_HASH_BUCKETS).select(F.col("id").alias("b"))
    grid = stot.crossJoin(F.broadcast(buckets))
    terms = (
        grid.join(per, ["source", "b"], "left")
        .join(F.broadcast(gl), "b", "left")
        .crossJoin(F.broadcast(gtot))
        .select(
            "source",
            F.expr("CAST(COALESCE(c, 0) AS DOUBLE) / t").alias("pa"),
            F.expr("CAST(COALESCE(g, 0) AS DOUBLE) / gt").alias("pb"),
        )
    )
    return terms.groupBy("source").agg(
        F.round(F.sum(F.expr(_JS_TERM)), 4).alias("js_div")
    )


@query(
    "ml_kfold_assign",
    oracle="""
    WITH f AS (
        SELECT lang,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                    % 5 AS INT) AS fold
        FROM documents
    )
    SELECT fold, lang, COUNT(*) AS n_docs
    FROM f GROUP BY 1, 2
    """,
)
def ml_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold (k=5) cross-validation assignment with a
    balance audit: each document's fold is a hash of its IDENTITY (md5
    of doc_id mod k), so folds are stable across reruns, engines,
    repartitions and corpus growth — append-only corpora never shuffle
    existing docs between folds (the property ``rand(seed)`` splits
    lose the moment row order changes). Output is the fold x lang count
    grid a stratification audit reads.

    Same identity-hash gate as ``dataset_split_holdout``; at train time
    fold i's train set is ``fold != i`` applied at READ time — zero
    stored fold column, k passes over the same immutable corpus.
    """
    d = table(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 5
    ).cast("int")
    return (
        d.select(fold.alias("fold"), "lang")
        .groupBy("fold", "lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


@query(
    "ml_train_test_leakage_check",
    oracle="""
    WITH s AS (
        SELECT doc_id, lang, md5(text) AS h,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                    % 100 AS INT) AS b
        FROM documents
    ),
    train AS (SELECT DISTINCT h FROM s WHERE b < 80),
    test AS (SELECT * FROM s WHERE b >= 90)
    SELECT t.lang,
           CAST(COUNT(*) AS BIGINT) AS n_test_docs,
           CAST(SUM(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_leaked
    FROM test t LEFT JOIN train tr ON t.h = tr.h
    GROUP BY t.lang
    """,
)
def ml_train_test_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→test contamination audit: using the SAME identity-hash
    split as ``dataset_split_holdout`` (80/10/10), count test documents
    whose exact text (md5 content hash) also appears in the train
    split — the leak that silently inflates eval scores and the first
    check run before any benchmark number is trusted.

    Content hashes are 16-byte keys, so the audit shuffles hashes, not
    documents; the train side collapses to DISTINCT hashes before the
    join (|unique train texts|, broadcastable far beyond fixture
    scale). Near-dup leakage is the same join over the minhash
    signature table (``oph_state_cached``) instead of md5 — the exact
    form here is the certain-leak floor.
    """
    d = table(spark, sf_dir, "documents")
    b = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    ).cast("int")
    s = d.select("lang", F.md5("text").alias("h"), b.alias("b"))
    train = s.filter(F.col("b") < 80).select("h").distinct()
    test = s.filter(F.col("b") >= 90)
    joined = test.join(
        F.broadcast(train.withColumnRenamed("h", "th")),
        test["h"] == F.col("th"),
        "left",
    )
    return joined.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_test_docs"),
        F.sum(F.col("th").isNotNull().cast("long")).cast("bigint").alias("n_leaked"),
    )


@query(
    "ml_calibration_bins",
    oracle="""
    WITH scored AS (
        SELECT CAST(CAST(json_extract_string(props, '$.k') AS INT) AS DOUBLE)
                   / 100 AS score,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
    )
    SELECT CAST(FLOOR(score * 10) AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(score), 6) AS mean_score,
           ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS outcome_rate
    FROM scored
    GROUP BY 1
    """,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins: a model score (here the normalized
    ``props.k`` property as a deterministic stand-in for a predicted
    purchase probability) bucketed into deciles with mean score vs
    observed outcome rate per bin — THE calibration table every scoring
    model ships with (a well-calibrated model has mean_score ≈
    outcome_rate per bin; the fixture's score is independent of the
    outcome, so the flat outcome_rate across bins is itself the
    demonstration). Swap the score column for a real model output and
    nothing else changes.

    One scan, decile membership by exact integer FLOOR on the 2-dp
    score, one ≤10-row aggregate; mean_score is AVG over identical
    doubles in both engines, rounded at 6 dp.
    """
    ev = table(spark, sf_dir, "events")
    scored = ev.select(
        (
            F.get_json_object("props", "$.k").cast("int").cast("double") / 100
        ).alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    ).filter(F.col("score").isNotNull())
    return scored.groupBy(
        F.floor(F.col("score") * 10).cast("int").alias("bin")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("score"), 6).alias("mean_score"),
        F.expr("ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6)").alias(
            "outcome_rate"
        ),
    )

# Shared expression text for ml_target_encoding_loo (same string parses
# on both engines -> identical IEEE op order).
_LOO = "(CAST(s1 AS DOUBLE) - o_totalprice) / (n - 1)"
_SMOOTH = (
    "(CAST(s1 AS DOUBLE) - o_totalprice + 20.0 * prior) / (n - 1 + 20.0)"
)


@query(
    "ml_target_encoding_loo",
    oracle=f"""
    WITH seg AS (
        SELECT o.o_orderkey, o.o_totalprice, c.c_mktsegment
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    stats AS (
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s1
        FROM seg GROUP BY c_mktsegment
    ),
    gstats AS (
        SELECT CAST(SUM(s1) AS DOUBLE) / SUM(n) AS prior FROM stats
    )
    SELECT o_orderkey,
           c_mktsegment AS segment,
           o_totalprice AS target,
           ROUND({_LOO}, 6) AS loo_encoding,
           ROUND({_SMOOTH}, 6) AS smoothed_encoding
    FROM seg JOIN stats USING (c_mktsegment) CROSS JOIN gstats
    WHERE o_orderkey % 101 = 0
    """,
)
def ml_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the customer market segment
    against order value — the categorical-feature encoding that avoids
    self-leakage by excluding each row's own target from its group mean
    ((Σ − x)/(n − 1)), plus the m-estimate smoothed variant (m = 20
    pseudo-observations of the global prior) that tames rare segments.
    A 1/101 keyed sample of encoded rows returns; statistics use ALL
    rows.

    Plan: one broadcast dim join tags facts with the segment, one
    aggregate collapses to |segments| exact-DECIMAL sums, and the
    encodings are per-row codegen against the broadcast stats — no
    window over the fact table, no per-row Python. The LOO/smoothing
    formulas are shared expression text with the oracle, so the 6-dp
    rounding sits on bit-identical doubles.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_mktsegment"
    )
    dp = F.col("o_totalprice").cast("decimal(18,2)")
    stats = seg.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(dp).alias("s1"),
    )
    glob = stats.agg(
        F.expr("CAST(SUM(s1) AS DOUBLE) / SUM(n)").alias("prior")
    )
    return (
        seg.filter(F.col("o_orderkey") % 101 == 0)
        .join(F.broadcast(stats), "c_mktsegment")
        .crossJoin(F.broadcast(glob))
        .select(
            "o_orderkey",
            F.col("c_mktsegment").alias("segment"),
            F.col("o_totalprice").alias("target"),
            F.expr(f"ROUND({_LOO}, 6)").alias("loo_encoding"),
            F.expr(f"ROUND({_SMOOTH}, 6)").alias("smoothed_encoding"),
        )
    )


# Shared AUC closed form: S1 is twice the positive midrank sum (exact
# integer), so AUC = (S1/2 - n1(n1+1)/2) / (n1*n0) evaluates from exact
# integers on both engines.
_AUC = (
    "(CAST(s1x2 AS DOUBLE) / 2 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2)"
    " / (CAST(n1 AS DOUBLE) * n0)"
)


@query(
    "ml_rank_auc",
    oracle=f"""
    WITH scored AS (
        SELECT value AS score,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE value IS NOT NULL
    ),
    vals AS (
        SELECT score,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM scored GROUP BY score
    ),
    ranked AS (
        SELECT pos, cnt,
               SUM(cnt) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - cnt + 1 AS min_rank
        FROM vals
    ),
    agg AS (
        SELECT CAST(SUM(pos * (2 * min_rank + cnt - 1)) AS BIGINT) AS s1x2,
               CAST(SUM(pos) AS BIGINT) AS n1,
               CAST(SUM(cnt - pos) AS BIGINT) AS n0
        FROM ranked
    )
    SELECT n1 AS n_positive, n0 AS n_negative,
           ROUND({_AUC}, 6) AS auc
    FROM agg
    """,
)
def ml_rank_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC of "event value predicts purchase" via the
    Mann-Whitney U statistic — rank arithmetic, no threshold sweep, no
    trapezoids: AUC = (Σ positive midranks − n₁(n₁+1)/2) / n₁n₀, with
    ties handled by exact midranks so the number is the true
    probability a random positive outranks a random negative. The
    model-eval primitive next to ``ml_calibration_bins`` (that one asks
    "are the scores honest", this one "do they rank").

    Scale shape: scores collapse to a (score → count, positives) frame
    first; the global cumulative rank over that frame runs through the
    two-phase bucket-cut pattern (windows.py — no single-partition
    window even when scores are all-distinct), and
    midrank sums are exact integers throughout — both engines divide
    the same bigints.
    """
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # materialize the (score, cnt, pos) collapse ONCE (the heavy pass);
    # everything downstream consumes the checkpointed frame
    vals = (
        e.groupBy(F.col("value").alias("score"))
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.sum((F.col("event_type") == "purchase").cast("long"))
            .cast("bigint")
            .alias("pos"),
        )
        .localCheckpoint(eager=True)
    )
    # Global cumulative count in score order via the bucket-cut pattern
    # (two_phase_global_rank's shape, carrying SUM(cnt)), with the cut
    # selection and bucket offsets IN-PLAN (round-11 opt: the old
    # approxQuantile + bucket-count collect ran 2 further blocking
    # driver jobs per call): cuts come from a loose in-plan
    # percentile_approx over the checkpointed frame (1-row broadcast;
    # cuts only balance buckets, min_rank stays exact for ANY cut set),
    # bucket offsets from a <=33-row broadcast self-join prefix sum (no
    # window, no WindowExec warning) — one checkpoint job + one final
    # action instead of four sequential driver barriers.
    cuts1 = vals.agg(
        F.expr(
            "percentile_approx(score, array("
            + ",".join(str(i / 32) for i in range(1, 32))
            + "), 100)"
        ).alias("__cs")
    )
    vb = (
        vals.crossJoin(F.broadcast(cuts1))
        .withColumn(
            "__bkt",
            F.expr("size(filter(__cs, c -> score > c))"),
        )
        .drop("__cs")
    )
    bw = vb.groupBy("__bkt").agg(F.sum("cnt").alias("bc"))
    lo = bw.select(F.col("__bkt").alias("__b2"), F.col("bc").alias("__bc2"))
    offsets = (
        bw.join(F.broadcast(lo), F.col("__b2") < F.col("__bkt"), "left")
        .groupBy("__bkt")
        .agg(F.coalesce(F.sum("__bc2"), F.lit(0)).alias("__off"))
    )
    from pyspark.sql import Window as W

    wloc = (
        W.partitionBy("__bkt")
        .orderBy("score")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    ranked = (
        vb.join(F.broadcast(offsets), "__bkt")
        .withColumn(
            "min_rank",
            F.col("__off") + F.sum("cnt").over(wloc) - F.col("cnt") + 1,
        )
        .drop("__bkt", "__off")
    )
    agg = ranked.agg(
        F.sum(F.col("pos") * (2 * F.col("min_rank") + F.col("cnt") - 1))
        .cast("bigint")
        .alias("s1x2"),
        F.sum("pos").cast("bigint").alias("n1"),
        F.sum(F.col("cnt") - F.col("pos")).cast("bigint").alias("n0"),
    )
    return agg.select(
        F.col("n1").alias("n_positive"),
        F.col("n0").alias("n_negative"),
        F.expr(f"ROUND({_AUC}, 6)").alias("auc"),
    )
