"""Scalar function families (B34-B41).

Each op exercises one family as aliased columns over a key-bounded subset
(the bound is a pushdown-able key predicate, not LIMIT, so the scan prunes
and the result is deterministic). All expressions are JVM-side builtins
inside whole-stage codegen — no Python in the hot path.

Cross-engine exactness notes:
- String/date/int ops are exact. Double per-row arithmetic is exact
  (same IEEE ops). `sqrt` is correctly rounded by IEEE — exact.
- `ln`/`exp` are libm-dependent (may differ in the last ulp between the
  JVM and DuckDB): rounded to 6 dp, which is safe because the results are
  irrational (never sit on a decimal grid boundary). NEVER round a value
  whose true decimal form lies exactly on the rounding grid (e.g.
  round(money, 1)) — the two engines' rounding paths disagree there.

Reference locus: Athena/Presto SQL passthrough,
[R] dataengineeringutils/athena.py (SURVEY.md §0/§2.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringutils_spark.registry import query
from dataengineeringutils_spark.tables import table


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LOWER(p_brand) AS brand_lower,
           SUBSTRING(p_name, 1, 5) AS name_head,
           TRIM(CONCAT(' ', p_name, ' ')) AS name_trim,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           CONCAT_WS('-', p_brand, p_type) AS brand_type,
           REPLACE(p_name, ' ', '_') AS name_snake,
           LPAD(p_type, 12, '.') AS type_pad,
           REGEXP_EXTRACT(p_name, '([a-z]+)$', 1) AS last_word
    FROM part
    WHERE p_partkey <= 100
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B34: string function family over part."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad("p_type", 12, ".").alias("type_pad"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(month(o_orderdate) AS INT) AS o_month,
           CAST(day(o_orderdate) AS INT) AS o_day,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS TIMESTAMP) AS plus_30d,
           CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS TIMESTAMP) AS plus_3mo,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since_epoch0,
           CAST(CAST(last_day(o_orderdate) AS DATE) AS TIMESTAMP) AS month_end
    FROM orders
    WHERE o_orderkey <= 200
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35: date/time function family (DuckDB's date_diff argument order is
    flipped vs Spark's datediff — aligned in the oracle, per FIXTURES.md)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.month("o_orderdate").cast("int").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("o_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("timestamp").alias("plus_30d"),
        F.add_months(F.col("o_orderdate").cast("date"), 3).cast("timestamp").alias("plus_3mo"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch0"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp").alias("month_end"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT o_orderkey,
           ABS(o_totalprice - 50000.0) AS abs_diff,
           CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           SQRT(o_totalprice) AS price_sqrt,
           o_orderkey % 7 AS key_mod7,
           CAST(SIGN(o_totalprice - 50000.0) AS INT) AS diff_sign,
           ROUND(LN(o_totalprice), 6) AS price_ln,
           o_totalprice * o_totalprice AS price_sq
    FROM orders
    WHERE o_orderkey <= 200
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B36: math function family (sqrt exact; ln rounded off-grid)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.abs(price - 50000.0).alias("abs_diff"),
        F.ceil(price).cast("long").alias("price_ceil"),
        F.floor(price).cast("long").alias("price_floor"),
        F.sqrt(price).alias("price_sqrt"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.signum(price - 50000.0).cast("int").alias("diff_sign"),
        F.round(F.ln(price), 6).alias("price_ln"),
        (price * price).alias("price_sq"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 10000 THEN 'small'
                WHEN o_totalprice < 100000 THEN 'medium'
                ELSE 'large' END AS price_tier,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_clean,
           GREATEST(o_totalprice, 50000.0) AS at_least_50k,
           LEAST(o_totalprice, 50000.0) AS at_most_50k,
           CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    WHERE o_orderkey <= 500
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37: CASE/coalesce/nullif/greatest/least family."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(price < 10000, "small")
        .when(price < 100000, "medium")
        .otherwise("large")
        .alias("price_tier"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_clean"
        ),
        F.greatest(price, F.lit(50000.0)).alias("at_least_50k"),
        F.least(price, F.lit(50000.0)).alias("at_most_50k"),
        F.when(F.col("o_orderpriority").like("1-%"), 1).otherwise(0).alias("is_urgent"),
    )


@query(
    "fn_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(o_custkey AS VARCHAR) AS custkey_str,
           CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS priority_num,
           CAST(o_custkey AS DOUBLE) AS custkey_dbl,
           strftime(o_orderdate, '%Y-%m-%d') AS date_str,
           CAST(CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS TIMESTAMP) AS date_roundtrip,
           CAST(strftime(o_orderdate, '%Y-%m-%d') || ' 12:00:00' AS TIMESTAMP) AS noon_ts
    FROM orders
    WHERE o_orderkey <= 200
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B38: cast/format family (format tokens aligned: Spark 'yyyy-MM-dd'
    ↔ DuckDB strftime '%Y-%m-%d')."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    date_str = F.date_format("o_orderdate", "yyyy-MM-dd")
    return o.select(
        "o_orderkey",
        F.col("o_custkey").cast("string").alias("custkey_str"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("priority_num"),
        F.col("o_custkey").cast("double").alias("custkey_dbl"),
        date_str.alias("date_str"),
        F.to_date(date_str, "yyyy-MM-dd").cast("timestamp").alias("date_roundtrip"),
        F.to_timestamp(F.concat(date_str, F.lit(" 12:00:00"))).alias("noon_ts"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           embedding[1] AS first_val,
           SQRT(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2_norm,
           list_sort(embedding, 'DESC')[1:3] AS top3
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B39: array function family over embeddings (1-based indexing in
    both engines; float->double casts before arithmetic so the math is
    bit-identical)."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)).alias("l2_norm"),
        F.slice(F.sort_array("embedding", asc=False), 1, 3).alias("top3"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
               / COUNT(*) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B40: JSON extraction + aggregate (exact integer sums; avg is one
    deterministic double division)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        (F.sum(k).cast("double") / F.count("*")).alias("avg_k"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           event_type AS m_type,
           CAST(user_id AS BIGINT) AS m_user
    FROM events
    WHERE event_id < 500
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B41: build a map with str_to_map, extract scalars back out.

    The oracle states the semantic identity (extracted values equal the
    source columns) — the map itself never crosses the comparison boundary,
    per SURVEY's note that map literals hash engine-specifically.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    m = F.str_to_map(
        F.concat(
            F.lit("type:"),
            F.col("event_type"),
            F.lit(",user:"),
            F.col("user_id").cast("string"),
        ),
        F.lit(","),
        F.lit(":"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.element_at(m, "user").cast("long").alias("m_user"),
    )


@query(
    "fn_variant",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           COUNT(CAST(json_extract_string(props, '$.missing') AS BIGINT)) AS n_missing
    FROM events
    GROUP BY event_type
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON via Spark 4 VARIANT: ``parse_json`` shreds the
    props column once into the binary variant encoding, then typed
    ``variant_get`` paths extract fields — the scale-friendly way to query
    ragged JSON (parse once, extract many, no per-extract re-parse, and
    columnar shredding when written to parquet). Absent paths yield NULL
    (counted zero by COUNT), matching the oracle's json_extract semantics.
    """
    ev = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    shredded = ev.select(
        "event_type",
        F.try_variant_get(v, "$.k", "long").alias("k"),
        F.try_variant_get(v, "$.missing", "long").alias("missing"),
    )
    return shredded.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count("missing").alias("n_missing"),
    )


@query(
    "fn_string_distance",
    oracle="""
    SELECT p_partkey,
           levenshtein(p_name, p_brand) AS lev,
           CAST(position('a' IN p_name) AS INT) AS pos_a,
           reverse(p_brand) AS rev_brand,
           repeat(p_type, 2) AS type2
    FROM part
    WHERE p_partkey < 500
    """,
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance + positional string family (fuzzy matching support:
    levenshtein is the exact-verify step behind blocking-based record
    linkage, the same pattern as the dedup operators' candidate+verify)."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_brand").alias("lev"),
        F.instr("p_name", "a").cast("int").alias("pos_a"),
        F.reverse("p_brand").alias("rev_brand"),
        F.repeat("p_type", 2).alias("type2"),
    )


@query(
    "agg_bool",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_discount <= 0.08) AS all_low_disc,
           bool_or(l_quantity >= 45) AS any_big_qty,
           count_if(l_tax > 0.05) AS n_taxed
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family (every/some/count_if — ANSI bool_and /
    bool_or). Short-circuit-friendly partial aggregation: each partition
    contributes one boolean/long per group."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.every(F.col("l_discount") <= 0.08).alias("all_low_disc"),
        F.some(F.col("l_quantity") >= 45).alias("any_big_qty"),
        F.count_if(F.col("l_tax") > 0.05).alias("n_taxed"),
    )


@query(
    "fn_array_ops",
    oracle="""
    SELECT vec_id,
           list_contains(ia, 0) AS has_zero,
           CAST(list_position(ia, 1) AS INT) AS pos_one,
           list_has_any(ia, [1, 2, 3]) AS overlaps_123,
           list_sort(list_distinct(ia)) AS sorted_distinct,
           list_max(ia) AS mx,
           list_min(ia) AS mn
    FROM (
        SELECT vec_id,
               list_transform(embedding[1:8], x -> CAST(floor(x * 4) AS BIGINT)) AS ia
        FROM embeddings
        WHERE vec_id < 200
    )
    """,
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array membership/position/set family on derived integer arrays
    (first 8 embedding dims quantized). Complements fn_array's
    numeric/slicing coverage; 1-based positions match DuckDB, absent
    elements yield position 0 in both engines."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    ia = F.transform(
        F.slice("embedding", 1, 8),
        lambda x: F.floor(x.cast("double") * 4).cast("long"),
    )
    d = e.select("vec_id", ia.alias("ia"))
    return d.select(
        "vec_id",
        F.array_contains("ia", F.lit(0)).alias("has_zero"),
        F.array_position("ia", 1).cast("int").alias("pos_one"),
        F.arrays_overlap("ia", F.array(F.lit(1), F.lit(2), F.lit(3))).alias(
            "overlaps_123"
        ),
        F.array_sort(F.array_distinct("ia")).alias("sorted_distinct"),
        F.array_max("ia").alias("mx"),
        F.array_min("ia").alias("mn"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS h_md5,
           sha256(p_name) AS h_sha256
    FROM part
    WHERE p_partkey < 500
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash family (md5 / sha-256, lowercase hex in both
    engines) — content addressing and stable record fingerprints."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("h_md5"),
        F.sha2("p_name", 256).alias("h_sha256"),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           CAST(LEN(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
           regexp_matches(p_name, '^[a-m]') AS starts_early,
           regexp_extract(p_brand, '([0-9]+)$', 1) AS brand_num
    FROM part
    WHERE p_partkey < 500
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function family: extract / global replace / match count /
    boolean match / anchored capture.

    Spark ``regexp_replace`` is global by default; DuckDB needs the 'g'
    flag — the one semantic trap in this family. All Java-regex patterns
    here are RE2-compatible so both engines compile them identically.
    Per-row codegen expressions; the pushed ``p_partkey`` filter bounds
    the scan, and at 100 TB regex cost scales linearly with no shuffle.
    """
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.regexp_count("p_name", F.lit("[aeiou]")).cast("int").alias("n_vowels"),
        F.col("p_name").rlike("^[a-m]").alias("starts_early"),
        F.regexp_extract("p_brand", "([0-9]+)$", 1).alias("brand_num"),
    )


@query(
    "fn_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(sin(l_quantity), 6) AS s,
           ROUND(cos(l_quantity), 6) AS c,
           ROUND(tan(l_quantity / 100.0), 6) AS t,
           ROUND(asin(l_discount), 6) AS a_s,
           ROUND(atan2(l_quantity, l_extendedprice), 6) AS a2,
           ROUND(degrees(l_discount), 6) AS deg,
           ROUND(radians(l_quantity), 6) AS rad
    FROM lineitem
    WHERE l_orderkey < 300
    """,
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric / angular function family (sin, cos, tan, asin,
    atan2, degrees, radians).

    Both engines delegate to libm doubles; rounded 6 dp to absorb the
    last-ulp differences libm builds are allowed. Pure codegen map —
    no shuffle at any scale.
    """
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin("l_quantity"), 6).alias("s"),
        F.round(F.cos("l_quantity"), 6).alias("c"),
        F.round(F.tan(F.col("l_quantity") / 100.0), 6).alias("t"),
        F.round(F.asin("l_discount"), 6).alias("a_s"),
        F.round(F.atan2(F.col("l_quantity"), F.col("l_extendedprice")), 6).alias("a2"),
        F.round(F.degrees("l_discount"), 6).alias("deg"),
        F.round(F.radians("l_quantity"), 6).alias("rad"),
    )


@query(
    "fn_array_hof",
    oracle="""
    SELECT vec_id,
           LEN(list_filter(embedding, x -> x > 0)) AS n_pos,
           LEN(list_filter(embedding, x -> x > 0.9)) > 0 AS any_big,
           LEN(list_filter(embedding, x -> NOT (x > -0.9))) = 0 AS all_gt,
           ROUND(list_sum(list_transform(embedding,
                                         x -> CAST(x AS DOUBLE) * x)), 4) AS sumsq
    FROM embeddings
    WHERE vec_id < 500
    """,
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: filter / exists / forall / zip_with
    + aggregate, reduced to scalar outputs.

    ``sumsq`` runs ``zip_with`` of the embedding with itself then a
    fold — the Spark shape for element-wise vector math; the oracle
    expresses the same value as transform+list_sum. HOF lambdas evaluate
    INTERPRETED (not codegen, ~36 µs/element measured — see
    operators/dedup.py): fine here where each 64-element array is
    touched once, but hot loops should use the explode+window shape
    instead.
    """
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    prod = F.zip_with(
        "embedding", "embedding", lambda a, b: a.cast("double") * b
    )
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.exists("embedding", lambda x: x > 0.9).alias("any_big"),
        F.forall("embedding", lambda x: x > -0.9).alias("all_gt"),
        F.round(
            F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("sumsq"),
    )


@query(
    "fn_extract",
    oracle="""
    SELECT event_id,
           EXTRACT(hour FROM ts) AS h,
           EXTRACT(minute FROM ts) AS mi,
           EXTRACT(second FROM ts) AS s,
           EXTRACT(doy FROM ts) AS doy,
           EXTRACT(week FROM ts) AS wk,
           EXTRACT(quarter FROM ts) AS q,
           EXTRACT(isodow FROM ts) AS idow,
           CAST(FLOOR(EXTRACT(epoch FROM ts)) AS BIGINT) AS ep
    FROM events
    WHERE event_id < 1000
    """,
)
def fn_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp part-extraction family (EXTRACT surface).

    Alignment traps encoded here: epoch must FLOOR (DuckDB's cast
    rounds, Spark's unix_timestamp truncates); day-of-week must be ISO
    (Spark ``dayofweek`` is 1=Sunday, ``weekday``+1 is isodow); week is
    ISO week-of-year in both engines. Pure codegen projection.
    """
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return e.select(
        "event_id",
        F.hour("ts").cast("long").alias("h"),
        F.minute("ts").cast("long").alias("mi"),
        F.second("ts").cast("long").alias("s"),
        F.dayofyear("ts").cast("long").alias("doy"),
        F.weekofyear("ts").cast("long").alias("wk"),
        F.quarter("ts").cast("long").alias("q"),
        (F.weekday("ts") + 1).cast("long").alias("idow"),
        F.unix_timestamp("ts").alias("ep"),
    )


@query(
    "fn_url",
    oracle="""
    SELECT doc_id,
           url,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' || doc_id
                   || '?lang=' || lang || '&v=1' AS url
        FROM documents
        WHERE doc_id < 200
    )
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family: construct, then decompose with ``parse_url``.

    The fixture corpus carries no URLs, so the op builds one per document
    from real columns and then parses it back — the parse side is the
    operator under test (`parse_url` PROTOCOL/HOST/PATH/QUERY plus keyed
    query-parameter extraction), the Spark-native path for log/clickstream
    crawl pipelines. `parse_url` is a JVM builtin evaluated inside
    codegen; the oracle decomposes the identical strings with anchored
    regexes, pinning byte-identical components cross-engine.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    with_url = d.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id"),
            F.lit("?lang="),
            F.col("lang"),
            F.lit("&v=1"),
        ).alias("url"),
    )
    return with_url.select(
        "doc_id",
        "url",
        F.lower(F.parse_url("url", F.lit("PROTOCOL"))).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "fn_null_semantics",
    oracle="""
    SELECT seg,
           COUNT(*) AS n_rows,
           COUNT(seg) AS n_nonnull,
           SUM(CASE WHEN seg IS NOT DISTINCT FROM NULL
                    THEN 1 ELSE 0 END) AS n_nullsafe_null,
           ROUND(SUM(COALESCE(bal, 0)), 2) AS sum_bal_coalesced,
           ROUND(SUM(bal), 2) AS sum_bal_skipnull,
           COUNT(bal) AS n_bal
    FROM (
        SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
        FROM customer
    ) t
    GROUP BY seg
    ORDER BY seg NULLS FIRST
    """,
)
def fn_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics family: NULLIF production, null-retaining GROUP BY,
    COUNT(*) vs COUNT(col), null-safe equality (``<=>`` / IS NOT DISTINCT
    FROM), aggregate null-skipping vs COALESCE imputation, NULLS FIRST
    ordering.

    The three-valued-logic corners every engine must agree on: the NULL
    group is a real group (not dropped), SUM skips NULLs while
    COALESCE(bal, 0) imputes them (identical here because the imputed
    value is 0 — both columns asserted so a drifting engine fails on one
    of them), and ``eqNullSafe`` is the only equality that is TRUE on
    NULL = NULL. Sort order of NULLs is engine-DEFAULT-divergent (Spark
    ASC puts them first, DuckDB last) — pinned explicitly on both sides,
    the portable form.
    """
    c = table(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        F.when(F.col("c_acctbal") < 0, F.lit(None))
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    return (
        c.groupBy("seg")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("seg").alias("n_nonnull"),
            F.sum(
                F.when(F.col("seg").eqNullSafe(F.lit(None)), 1).otherwise(0)
            ).alias("n_nullsafe_null"),
            F.round(F.sum(F.coalesce(F.col("bal"), F.lit(0.0))), 2).alias(
                "sum_bal_coalesced"
            ),
            F.round(F.sum("bal"), 2).alias("sum_bal_skipnull"),
            F.count("bal").alias("n_bal"),
        )
        .orderBy(F.col("seg").asc_nulls_first())
    )


@query(
    "fn_try_arith",
    oracle="""
    SELECT o_orderkey,
           o_totalprice / NULLIF(o_custkey % 3, 0) AS safe_div,
           TRY_CAST(o_orderpriority AS DOUBLE) AS bad_num,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_digit,
           CAST(TRY_CAST(o_orderstatus AS DATE) AS VARCHAR) AS bad_date
    FROM orders
    WHERE o_orderkey <= 300
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY-function family: NULL-on-error arithmetic under ANSI mode.

    The engine runs ANSI mode (division by zero and malformed casts are
    runtime ERRORS, matching DuckDB) — ``try_divide``/``try_cast`` are
    the sanctioned per-expression escape hatch, turning the failure into
    NULL instead of killing a 100 TB job at row three billion. Each
    column exercises one failure class: integer-zero denominators,
    non-numeric strings to double, a leading-digit extraction that DOES
    cast, and a string that can never be a date (surfaced as string —
    an all-NULL date column types differently across engines). The
    oracle mirrors with TRY_CAST / NULLIF-guarded division.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 3).alias(
            "safe_div"
        ),
        F.try_to_number(F.col("o_orderpriority"), F.lit("999.99")).cast(
            "double"
        ).alias("bad_num"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_digit"),
        F.col("o_orderstatus").try_cast("date").cast("string").alias("bad_date"),
    )


@query(
    "fn_format",
    oracle="""
    SELECT p_partkey,
           printf('%07d', p_partkey) AS key_pad,
           printf('%x', p_partkey) AS key_hex,
           printf('%o', p_partkey) AS key_oct,
           printf('%s#%03d', p_brand, p_partkey % 1000) AS brand_tag,
           printf('%5d|', p_size) AS size_ralign,
           printf('%-5d|', p_size) AS size_lalign
    FROM part
    WHERE p_partkey <= 200
    """,
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B163: printf-style formatting family (``format_string``).

    Integer conversions only (%d/%x/%o, width/zero-pad/left-align flags):
    float conversions are deliberately excluded because %f rounding modes
    differ across engines (Java Formatter HALF_UP vs C half-even) — that's
    a documented cross-engine trap, not a missing feature (fn_cast covers
    numeric rendering via CAST). Pure codegen JVM builtin, no UDF.
    """
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey",
        F.format_string("%07d", "p_partkey").alias("key_pad"),
        F.format_string("%x", "p_partkey").alias("key_hex"),
        F.format_string("%o", "p_partkey").alias("key_oct"),
        F.format_string(
            "%s#%03d", F.col("p_brand"), F.col("p_partkey") % 1000
        ).alias("brand_tag"),
        F.format_string("%5d|", "p_size").alias("size_ralign"),
        F.format_string("%-5d|", "p_size").alias("size_lalign"),
    )


@query(
    "fn_collation_group",
    oracle="""
    WITH mixed AS (
        SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
                    ELSE lower(p_brand) END AS brand_mixed
        FROM part
    )
    SELECT lower(brand_mixed) AS brand_key,
           COUNT(*) AS n,
           COUNT(DISTINCT brand_mixed) AS n_raw_variants
    FROM mixed
    GROUP BY lower(brand_mixed)
    """,
)
def fn_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 UTF8_LCASE) vs binary distinct.

    Case-divergent spellings of one brand (synthesized: even keys UPPER,
    odd keys lower) collapse into a single group when the grouping key
    carries a case-insensitive collation — no lower() rewrite of the data.
    The binary COUNT(DISTINCT) alongside shows each group still holds 2
    raw variants. The emitted key is min(lower(...)) so the
    representative is deterministic (the collated min alone could pick
    either case variant — they compare equal under UTF8_LCASE).
    """
    p = table(spark, sf_dir, "part").select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_brand"))
        .otherwise(F.lower("p_brand"))
        .alias("brand_mixed")
    )
    return (
        p.groupBy(F.collate("brand_mixed", "UTF8_LCASE").alias("brand_ci"))
        .agg(
            F.min(F.lower("brand_mixed")).alias("brand_key"),
            F.count("*").alias("n"),
            F.countDistinct(F.collate("brand_mixed", "UTF8_BINARY")).alias(
                "n_raw_variants"
            ),
        )
        .select("brand_key", "n", "n_raw_variants")
    )


@query(
    "fn_encoding",
    oracle="""
    SELECT p_partkey,
           to_base64(encode(p_brand)) AS brand_b64,
           hex(encode(p_brand)) AS brand_hex,
           ascii(p_brand) AS first_cp,
           chr(65 + CAST(p_partkey % 26 AS INT)) AS key_letter,
           md5(p_brand) AS brand_md5
    FROM part
    WHERE p_partkey <= 200
    """,
)
def fn_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-encoding family: base64 / hex / codepoint / chr / digest.

    UTF-8 is pinned explicitly (``encode(..., 'UTF-8')``) so the bytes —
    and therefore the base64/hex/digest renderings — are engine-
    independent. Both engines render hex() digits uppercase and md5()
    lowercase — asserted by the oracle hash-match, not normalized away.
    """
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    brand_bytes = F.encode("p_brand", "UTF-8")
    return p.select(
        "p_partkey",
        F.base64(brand_bytes).alias("brand_b64"),
        F.hex(brand_bytes).alias("brand_hex"),
        F.ascii("p_brand").alias("first_cp"),
        F.char(F.lit(65) + (F.col("p_partkey") % 26).cast("int")).alias(
            "key_letter"
        ),
        F.md5(brand_bytes).alias("brand_md5"),
    )


@query(
    "fn_uuid_deterministic",
    oracle="""
    SELECT o_orderkey,
           concat(
               substr(h, 1, 8), '-', substr(h, 9, 4), '-',
               substr(h, 13, 4), '-', substr(h, 17, 4), '-',
               substr(h, 21, 12)
           ) AS row_uuid
    FROM (
        SELECT o_orderkey,
               md5(concat('orders', '|', CAST(o_orderkey AS VARCHAR), '|',
                          CAST(o_custkey AS VARCHAR))) AS h
        FROM orders
    )
    ORDER BY o_orderkey
    LIMIT 100
    """,
)
def fn_uuid_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (UUIDv5-style) row identifiers: md5 over a namespace
    + natural-key tuple, formatted 8-4-4-4-12.

    ``F.uuid()``/``rand()`` ids change on every run and every retry — a
    replayed task would mint DIFFERENT ids, corrupting downstream joins.
    Content-derived ids are the reproducible-pipeline answer, identical
    across engines (md5 is md5) and across task retries at any scale.
    """
    o = table(spark, sf_dir, "orders")
    h = F.md5(
        F.concat_ws(
            "|", F.lit("orders"), F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string")
        )
    )
    uuid = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    return (
        o.select("o_orderkey", uuid.alias("row_uuid"))
        .orderBy("o_orderkey")
        .limit(100)
    )


@query(
    "fn_timezone",
    oracle="""
    SELECT strftime(timezone('America/New_York', ts::TIMESTAMPTZ),
                    '%Y-%m-%d %H:%M:%S') AS ny_wall,
           strftime(timezone('Asia/Tokyo', ts::TIMESTAMPTZ),
                    '%Y-%m-%d %H:%M:%S') AS tokyo_wall,
           CAST(EXTRACT(hour FROM timezone('America/New_York',
                                           ts::TIMESTAMPTZ)) AS INT) AS ny_hour,
           CAST(EXTRACT(hour FROM ts) AS INT) AS utc_hour
    FROM events
    ORDER BY event_id
    LIMIT 200
    """,
)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B213: timezone rendering family — UTC instants to zone-local wall
    clocks (`from_utc_timestamp`), DST-aware (the NY offset flips
    -05:00/-04:00 across the fixture's March DST boundary, exercising the
    tz database, not a fixed offset).

    The engine stores instants (UTC); zone conversion is a RENDERING
    concern applied at the edge. Pure per-row codegen expressions — no
    shuffle; the LIMIT is a driver-side take over the pushed scan.
    """
    e = table(spark, sf_dir, "events")
    ny = F.from_utc_timestamp("ts", "America/New_York")
    tokyo = F.from_utc_timestamp("ts", "Asia/Tokyo")
    return (
        e.select(
            "event_id",
            F.date_format(ny, "yyyy-MM-dd HH:mm:ss").alias("ny_wall"),
            F.date_format(tokyo, "yyyy-MM-dd HH:mm:ss").alias("tokyo_wall"),
            F.hour(ny).cast("int").alias("ny_hour"),
            F.hour("ts").cast("int").alias("utc_hour"),
        )
        .orderBy("event_id")
        .limit(200)
        .drop("event_id")
    )


@query(
    "fn_datetime_make",
    oracle="""
    SELECT event_id,
           CAST(make_date(CAST(EXTRACT(year FROM ts) AS INT),
                     CAST(EXTRACT(month FROM ts) AS INT), 1)
                AS TIMESTAMP) AS month_start,
           make_timestamp(CAST(EXTRACT(year FROM ts) AS INT),
                          CAST(EXTRACT(month FROM ts) AS INT),
                          CAST(EXTRACT(day FROM ts) AS INT),
                          CAST(EXTRACT(hour FROM ts) AS INT), 0, 0)
               AS hour_floor,
           epoch_us(ts) - epoch_us(make_timestamp(
                          CAST(EXTRACT(year FROM ts) AS INT),
                          CAST(EXTRACT(month FROM ts) AS INT),
                          CAST(EXTRACT(day FROM ts) AS INT),
                          CAST(EXTRACT(hour FROM ts) AS INT), 0, 0))
               AS into_hour_us
    FROM events
    ORDER BY event_id
    LIMIT 100
    """,
)
def fn_datetime_make(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime CONSTRUCTION family: `make_date` / `make_timestamp` from
    extracted fields — the inverse of EXTRACT, used to rebuild clean
    period boundaries (month starts, hour floors) and the intra-period
    remainder. Pure per-row codegen; the remainder compares as exact
    integer microseconds (interval types render differently per engine).
    """
    e = table(spark, sf_dir, "events")
    y = F.year("ts")
    mo = F.month("ts")
    d = F.dayofmonth("ts")
    h = F.hour("ts")
    hour_floor = F.make_timestamp(y, mo, d, h, F.lit(0), F.lit(0))
    into_hour = F.col("ts") - hour_floor
    return (
        e.select(
            "event_id",
            F.make_date(y, mo, F.lit(1)).cast("timestamp").alias("month_start"),
            hour_floor.alias("hour_floor"),
            (F.unix_micros("ts") - F.unix_micros(hour_floor)).alias(
                "into_hour_us"
            ),
        )
        .orderBy("event_id")
        .limit(100)
    )


@query(
    "fn_string_extended",
    oracle="""
    SELECT p_partkey,
           translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
           reverse(p_name) AS rev,
           left(p_name, 5) AS l5,
           right(p_name, 5) AS r5,
           repeat(p_brand, 2) AS brand2,
           CAST(strpos(p_name, 'a') AS INT) AS first_a,
           split_part(p_type, ' ', 1) AS type_head,
           CAST(ascii(p_name) AS INT) AS first_code,
           rpad(p_brand, 12, '.') AS brand_pad
    FROM part
    WHERE p_partkey % 37 = 0
    """,
)
def fn_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string-function family (the second half of a SQL string
    surface): translate / reverse / left / right / repeat / position /
    split_part / ascii / rpad on a 1/37 keyed sample of parts. Each has
    an exact cross-engine definition (pure per-row codegen, no locale
    dependence); together with ``fn_string`` and
    ``fn_string_distance`` this covers the string functions the
    reference's Athena (Presto) dialect exposes.
    """
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") % 37 == 0)
    return p.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.reverse("p_name").alias("rev"),
        F.substring("p_name", 1, 5).alias("l5"),
        F.expr("right(p_name, 5)").alias("r5"),
        F.repeat("p_brand", 2).alias("brand2"),
        F.instr("p_name", "a").cast("int").alias("first_a"),
        F.expr("split_part(p_type, ' ', 1)").alias("type_head"),
        F.ascii("p_name").cast("int").alias("first_code"),
        F.rpad("p_brand", 12, ".").alias("brand_pad"),
    )


@query(
    "fn_date_trunc_family",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('year', CAST(o_orderdate AS DATE)) AS TIMESTAMP)
               AS y,
           CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS TIMESTAMP)
               AS q,
           CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS TIMESTAMP)
               AS mo,
           CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS TIMESTAMP)
               AS wk,
           CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS qtr_no,
           CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS iso_week
    FROM orders
    WHERE o_orderkey % 101 = 0
    """,
)
def fn_date_trunc_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc at every reporting grain (year / quarter / month /
    ISO-Monday week) plus quarter and ISO week numbers — the calendar
    bucketing functions every rollup/report leans on, pinned
    cross-engine on a keyed sample (both engines truncate weeks to
    Monday and number ISO weeks identically; DAY-OF-WEEK numbering is
    the one that differs, which is why ``orders_weekday_seasonality``
    derives it arithmetically instead).
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 101 == 0)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_trunc("year", d).alias("y"),
        F.date_trunc("quarter", d).alias("q"),
        F.date_trunc("month", d).alias("mo"),
        F.date_trunc("week", d).alias("wk"),
        F.quarter(d).cast("int").alias("qtr_no"),
        F.weekofyear(d).cast("int").alias("iso_week"),
    )


@query(
    "fn_map_hof",
    oracle="""
    WITH m AS (
        SELECT p_partkey,
               MAP(['size', 'retail_cents'],
                   [CAST(p_size AS BIGINT),
                    CAST(ROUND(p_retailprice * 100) AS BIGINT)]) AS feat
        FROM part WHERE p_partkey % 41 = 0
    )
    SELECT p_partkey,
           CAST(len(map_keys(feat)) AS INT) AS n_keys,
           feat['size'][1] AS size_v,
           CAST(list_sum(map_values(feat)) AS BIGINT) AS sum_values,
           CAST(len(list_filter(map_values(feat), v -> v > 100)) AS INT)
               AS n_large
    FROM m
    """,
)
def fn_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: build a typed feature map per row,
    then key/value extraction and HOF reductions over it (cardinality,
    point lookup, value sum, filtered count) — the map-column idioms of
    feature-store rows and sparse property bags, beyond ``fn_map``'s
    construction/lookup basics. Integer values end to end so every
    reduction is exact on both engines.
    """
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") % 41 == 0)
    feat = F.create_map(
        F.lit("size"),
        F.col("p_size").cast("bigint"),
        F.lit("retail_cents"),
        F.round(F.col("p_retailprice") * 100).cast("bigint"),
    )
    m = p.select("p_partkey", feat.alias("feat"))
    return m.select(
        "p_partkey",
        F.size(F.map_keys("feat")).cast("int").alias("n_keys"),
        F.element_at("feat", "size").alias("size_v"),
        F.aggregate(
            F.map_values("feat"), F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("sum_values"),
        F.size(
            F.filter(F.map_values("feat"), lambda v: v > 100)
        )
        .cast("int")
        .alias("n_large"),
    )


@query(
    "agg_product",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(product(1.0 + l_discount), 6) AS growth_factor,
           ROUND(exp(SUM(ln(1.0 + l_discount))), 6) AS growth_factor_logsum
    FROM lineitem
    WHERE l_orderkey % 1009 = 0
    GROUP BY l_returnflag
    """,
)
def agg_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT aggregate — the missing SQL builtin (compound growth,
    chained probabilities, survival products), recreated as
    exp(Σ ln x): associative, partial-aggregatable, and therefore
    distributed-safe — each partition sums logs map-side, merges sum
    (a naive sequential product is neither order-stable nor
    overflow-safe at scale). Computed on a keyed sample of positive
    factors (1 + discount); the oracle emits BOTH DuckDB's native
    ``product()`` and the same log-sum text — the two columns agreeing
    at 6 dp is the cross-check that the recreation IS the builtin.
    Zero/negative handling (sign parity + zero short-circuit) is the
    documented extension; factors here are strictly positive.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 1009 == 0
    )
    logsum = F.round(
        F.exp(F.sum(F.log(F.lit(1.0) + F.col("l_discount")))), 6
    )
    return li.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n"),
        logsum.alias("growth_factor"),
        logsum.alias("growth_factor_logsum"),
    )


@query(
    "fn_struct",
    oracle="""
    SELECT o_orderkey,
           ROW(o_orderstatus, o_totalprice) = ROW(o_orderstatus, o_totalprice)
               AS self_eq,
           ROW(o_totalprice, o_orderkey) <
               ROW(CAST(150000.0 AS DOUBLE), CAST(0 AS BIGINT)) AS below_pivot,
           struct_extract(
               struct_pack(status := o_orderstatus, price := o_totalprice),
               'status') AS status_out,
           struct_extract(
               struct_pack(status := o_orderstatus, price := o_totalprice),
               'price') AS price_out,
           ROW(o_orderkey, o_totalprice) <
               ROW(CAST(3000 AS BIGINT), CAST(0.0 AS DOUBLE))
               AS key_first_lt
    FROM orders
    WHERE o_orderkey % 97 = 0
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct scalar family: construction (``struct`` /
    ``named_struct``), field extraction, and LEXICOGRAPHIC struct
    comparison (=, <, field-order sensitivity) — the composite-sort-key idiom
    (ORDER BY struct(a, b)), the multi-column pivot filter
    (WHERE struct(ts, id) > last_seen for keyset pagination), and the
    typed-record shape nested pipelines pass between stages. Both
    engines define struct ordering field-by-field left to right, so
    the booleans are engine-portable; outputs are flattened back to
    scalars for the cross-engine hash.

    Pure whole-stage-codegen row expressions on a keyed sample — no
    shuffle, no UDF.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    s = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    pivot = F.struct(
        F.lit(150000.0).cast("double").alias("p"),
        F.lit(0).cast("bigint").alias("k"),
    )
    key = F.struct(
        F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k")
    )
    return o.select(
        "o_orderkey",
        (s == s).alias("self_eq"),
        (key < pivot).alias("below_pivot"),
        s.getField("status").alias("status_out"),
        s.getField("price").alias("price_out"),
        (
            F.struct(
                F.col("o_orderkey").alias("k"),
                F.col("o_totalprice").alias("p"),
            )
            < F.struct(
                F.lit(3000).cast("bigint").alias("k"),
                F.lit(0.0).cast("double").alias("p"),
            )
        ).alias("key_first_lt"),
    )


@query(
    "fn_timestamp_parse_formats",
    oracle="""
    WITH s AS (
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso,
               strftime(o_orderdate, '%Y%m%d') AS compact,
               strftime(o_orderdate, '%d/%m/%Y') AS slashed
        FROM orders WHERE o_orderkey % 101 = 0
    )
    SELECT o_orderkey,
           strptime(iso, '%Y-%m-%d %H:%M:%S') AS t_iso,
           strptime(compact, '%Y%m%d') AS t_compact,
           strptime(slashed, '%d/%m/%Y') AS t_slashed,
           try_strptime(compact, '%d/%m/%Y') AS t_bad
    FROM s
    """,
)
def fn_timestamp_parse_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp parsing across format dialects: ISO, compact yyyymmdd
    and day-first slashed — rendered and re-parsed with each engine's
    OWN format language (Spark ``yyyy-MM-dd`` vs strptime ``%Y-%m-%d``)
    to the same instants, plus a wrong-format parse that must yield
    NULL (``try_to_timestamp``), not an error — the ingestion-edge
    behavior every CSV/log loader depends on. Pinning the round-trip
    cross-engine guards exactly the class of format-token bugs
    (MM vs mm, dd vs DD) that silently shift dates.

    Pure per-row codegen on a keyed sample; no shuffle.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 101 == 0)
    s = o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("iso"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("compact"),
        F.date_format("o_orderdate", "dd/MM/yyyy").alias("slashed"),
    )
    return s.select(
        "o_orderkey",
        F.to_timestamp("iso", "yyyy-MM-dd HH:mm:ss").alias("t_iso"),
        F.to_timestamp("compact", "yyyyMMdd").alias("t_compact"),
        F.to_timestamp("slashed", "dd/MM/yyyy").alias("t_slashed"),
        F.try_to_timestamp("compact", F.lit("dd/MM/yyyy")).alias("t_bad"),
    )


@query(
    "fn_array_sort_comparator",
    oracle="""
    WITH ranked AS (
        SELECT l_orderkey,
               l_linenumber,
               l_quantity,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS n_items,
               ROW_NUMBER() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_quantity DESC, l_linenumber ASC
               ) AS rn
        FROM lineitem
        WHERE l_orderkey % 101 = 0
    )
    SELECT l_orderkey AS okey,
           CAST(n_items AS BIGINT) AS n_items,
           CAST(l_linenumber AS INT) AS top_line,
           l_quantity AS top_qty
    FROM ranked WHERE rn = 1
    """,
)
def fn_array_sort_comparator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``array_sort`` with a CUSTOM COMPARATOR lambda — the higher-order
    API for orderings SQL types don't carry natively (here: quantity
    descending, line number ascending as tie-break, expressed as a
    (-1, 0, 1) comparator over structs). Each order's lines collect
    into one array, sort in-place per row — no window, no second
    shuffle — and the head element is the top line; the oracle computes
    the same pick with rank windows, so a comparator sign error or
    unstable tie-break flips the hash.

    One keyed collect (bounded arrays: lines per order ≤ 7) and pure
    per-row higher-order evaluation after it.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 101 == 0
    )
    arrs = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_quantity").alias("q"),
                F.col("l_linenumber").alias("ln"),
            )
        ).alias("lines")
    )
    cmp_sorted = F.expr(
        """
        array_sort(lines, (a, b) -> CASE
            WHEN a.q > b.q THEN -1 WHEN a.q < b.q THEN 1
            WHEN a.ln < b.ln THEN -1 WHEN a.ln > b.ln THEN 1
            ELSE 0 END)
        """
    )
    return arrs.select(
        F.col("l_orderkey").alias("okey"),
        F.size("lines").cast("bigint").alias("n_items"),
        cmp_sorted.getItem(0).getField("ln").cast("int").alias("top_line"),
        cmp_sorted.getItem(0).getField("q").alias("top_qty"),
    )


@query(
    "fn_agg_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
               AS n_finished,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE year(o_orderdate) >= 2000) AS DOUBLE)
               AS recent_revenue,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE)
               / COUNT(*) FILTER (WHERE o_orderstatus = 'O')
               AS avg_open_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def fn_agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``FILTER (WHERE …)`` aggregate modifier: per-aggregate
    predicates in one pass — the standard (and self-documenting) form
    of the CASE-WHEN-inside-SUM idiom, with correct NULL semantics for
    free (a filtered-out row contributes nothing, where CASE's ELSE 0
    would drag a mean); the conditional mean is an exact-DECIMAL
    filtered SUM over a filtered COUNT, engine-identical. One scan, one group-by; every conditional
    metric shares the same partial aggregation.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_all,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
                   AS n_finished,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (WHERE year(o_orderdate) >= 2000) AS DOUBLE)
                   AS recent_revenue,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE)
                   / COUNT(*) FILTER (WHERE o_orderstatus = 'O')
                   AS avg_open_price
        FROM orders
        GROUP BY o_orderpriority
        """
    )
