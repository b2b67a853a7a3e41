"""Scalar function surface (SURVEY.md §2.9), exercised through the
ClickHouse-vocabulary helpers in moosestack_spark.sql.ch_functions so the
gate proves the translation layer, not just raw Spark functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.sql.ch_functions import ch
from moosestack_spark.tables import t

# --------------------------------------------------------------------------
# Date bucketing: toDate / toStartOfMonth / toStartOfWeek / toStartOfDay /
# toStartOfHour / toDayOfMonth over orders + events timestamps
# (helpers.ts:100-104 timeDimensions; bar_aggregated.py:16 toDayOfMonth).
# --------------------------------------------------------------------------


@query(
    "scalar_date_bucketing",
    oracle="""
SELECT
  day,
  month,
  week_sunday,
  day_of_month,
  COUNT(*) AS n
FROM (
  SELECT
    strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
    strftime(CAST(DATE_TRUNC('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month,
    strftime(CAST(DATE_TRUNC('week', o_orderdate + INTERVAL 1 DAY) AS DATE) - 1, '%Y-%m-%d') AS week_sunday,
    EXTRACT(day FROM o_orderdate) AS day_of_month
  FROM orders
)
GROUP BY day, month, week_sunday, day_of_month
""",
)
def scalar_date_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DATE-typed outputs are surfaced as 'yyyy-MM-dd' strings: pandas has no
    # date dtype, so a DATE column round-trips differently from DuckDB
    # (datetime64 midnight) vs Spark (date object) — strings are unambiguous.
    o = t(spark, sf_dir, "orders")
    fmt = "yyyy-MM-dd"
    return (
        o.select(
            F.date_format(ch.toDate("o_orderdate"), fmt).alias("day"),
            F.date_format(ch.toStartOfMonth("o_orderdate"), fmt).alias("month"),
            F.date_format(ch.toStartOfWeek("o_orderdate"), fmt).alias("week_sunday"),
            ch.toDayOfMonth("o_orderdate").cast("bigint").alias("day_of_month"),
        )
        .groupBy("day", "month", "week_sunday", "day_of_month")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "scalar_hour_bucketing",
    oracle="""
SELECT
  DATE_TRUNC('hour', ts) AS hour_bucket,
  CAST(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT) % 900) AS TIMESTAMP) AS q_bucket,
  COUNT(*) AS n
FROM events
GROUP BY 1, 2
""",
)
def scalar_hour_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return (
        e.select(
            ch.toStartOfHour("ts").alias("hour_bucket"),
            ch.toStartOfFifteenMinutes("ts").alias("q_bucket"),
        )
        .groupBy("hour_bucket", "q_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# String functions: lower/concat/substring/length/splitByChar on p_name.
# --------------------------------------------------------------------------


@query(
    "scalar_string_funcs",
    oracle="""
SELECT
  p_partkey,
  LOWER(p_name) AS lower_name,
  CONCAT(p_brand, ':', p_type) AS brand_type,
  SUBSTRING(p_name, 1, 5) AS name_prefix,
  LENGTH(p_name) AS name_len,
  LEN(STRING_SPLIT(p_name, ' ')) AS n_words,
  STRING_SPLIT(p_name, ' ')[1] AS first_word
FROM part
""",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    words = ch.splitByChar(" ", "p_name")
    return p.select(
        "p_partkey",
        ch.lower("p_name").alias("lower_name"),
        ch.concat("p_brand", F.lit(":"), "p_type").alias("brand_type"),
        ch.substring("p_name", 1, 5).alias("name_prefix"),
        ch.length("p_name").cast("bigint").alias("name_len"),
        ch.arrayLength(words).cast("bigint").alias("n_words"),
        ch.arrayElement(words, 1).alias("first_word"),
    )


# --------------------------------------------------------------------------
# Math: round/floor/ceil/abs/intDiv/modulo on prices & keys.  All inputs are
# exact fixed-point values so cross-engine doubles agree bit-for-bit.
# --------------------------------------------------------------------------


@query(
    "scalar_math_funcs",
    oracle="""
SELECT
  o_orderkey,
  ROUND(o_totalprice) AS price_round,
  FLOOR(o_totalprice) AS price_floor,
  CEIL(o_totalprice) AS price_ceil,
  ABS(o_totalprice - 100000) AS price_dist,
  CAST(FLOOR(o_orderkey / 100) AS BIGINT) AS key_div,
  o_orderkey % 7 AS key_mod
FROM orders
""",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        ch.round("o_totalprice").cast("double").alias("price_round"),
        ch.floor("o_totalprice").cast("double").alias("price_floor"),
        ch.ceil("o_totalprice").cast("double").alias("price_ceil"),
        ch.abs(F.col("o_totalprice") - 100000).alias("price_dist"),
        ch.intDiv("o_orderkey", 100).alias("key_div"),
        ch.modulo("o_orderkey", 7).alias("key_mod"),
    )


# --------------------------------------------------------------------------
# Conditionals: if / multiIf / coalesce / greatest / least.
# --------------------------------------------------------------------------


@query(
    "scalar_conditionals",
    oracle="""
SELECT
  c_custkey,
  CASE WHEN c_acctbal >= 0 THEN 'ok' ELSE 'debt' END AS standing,
  CASE
    WHEN c_acctbal >= 7500 THEN 'platinum'
    WHEN c_acctbal >= 5000 THEN 'gold'
    WHEN c_acctbal >= 0 THEN 'standard'
    ELSE 'delinquent'
  END AS tier,
  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment,
  GREATEST(c_acctbal, 0.0) AS bal_floor0,
  LEAST(c_acctbal, 1000.0) AS bal_cap1k
FROM customer
""",
)
def scalar_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        ch.if_(bal >= 0, F.lit("ok"), F.lit("debt")).alias("standing"),
        ch.multiIf(
            bal >= 7500,
            F.lit("platinum"),
            bal >= 5000,
            F.lit("gold"),
            bal >= 0,
            F.lit("standard"),
            F.lit("delinquent"),
        ).alias("tier"),
        ch.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment"
        ),
        ch.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        ch.least(bal, F.lit(1000.0)).alias("bal_cap1k"),
    )


# --------------------------------------------------------------------------
# JSON extraction from events.props (JSONExtract* family,
# data_models.py:92-103 / get_json_object in Spark).
# --------------------------------------------------------------------------


@query(
    "scalar_json_extract",
    oracle="""
SELECT
  event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
  json_extract_string(props, '$.missing') AS missing_key
FROM events
""",
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        ch.JSONExtractInt("props", "k").alias("k_value"),
        ch.JSONExtractString("props", "missing").alias("missing_key"),
    )


# --------------------------------------------------------------------------
# Array ops over embeddings.embedding: element_at, size, transform, forall,
# array_contains-style exists, aggregate (arraySum).
# --------------------------------------------------------------------------


@query(
    "scalar_array_ops",
    oracle="""
SELECT
  vec_id,
  LEN(embedding) AS dim,
  CAST(embedding[1] AS FLOAT) AS first_elem,
  CAST(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE) AS vec_sum,
  LIST_BOOL_AND(LIST_TRANSFORM(embedding, x -> x IS NOT NULL)) AS all_non_null,
  LIST_BOOL_OR(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) > 0.9)) AS any_gt_09
FROM embeddings
""",
)
def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        ch.arrayLength(emb).cast("bigint").alias("dim"),
        ch.arrayElement(emb, 1).alias("first_elem"),
        # sum in the same left-to-right order as DuckDB list_sum: both fold
        # sequentially over the (identical) array, so doubles agree.
        ch.arraySum(emb).alias("vec_sum"),
        ch.arrayAll(lambda x: x.isNotNull(), emb).alias("all_non_null"),
        ch.arrayExists(lambda x: x.cast("double") > 0.9, emb).alias("any_gt_09"),
    )


# --------------------------------------------------------------------------
# conversions (§2.9 row "conversions": toString toInt32 toFixed
# parseDateTime*) — exercised through the ch namespace so the CH-name layer
# itself is under the gate.
# --------------------------------------------------------------------------


@query(
    "scalar_conversions",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  CAST(l_orderkey AS VARCHAR) AS orderkey_str,
  CAST(FLOOR(l_quantity) AS INTEGER) AS qty_int,
  ROUND(l_quantity, 1) AS qty_fixed,
  strftime(CAST(strptime(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S'),
                '%Y-%m-%d %H:%M:%S') AS TIMESTAMP),
           '%Y-%m-%d %H:%M:%S') AS reparsed_ts
FROM lineitem
""",
)
def scalar_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """toString / toInt32 / toFixed / parseDateTimeBestEffort round-trip.
    (toInt32 truncates toward zero like CH; the oracle spells FLOOR because
    DuckDB's double->int cast rounds — identical on these integral values.
    toFixed rounds a FIXED-POINT source, never a computed double.)"""
    li = t(spark, sf_dir, "lineitem")
    ts_str = F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ch.toString("l_orderkey").alias("orderkey_str"),
        ch.toInt32("l_quantity").alias("qty_int"),
        ch.toFixed("l_quantity", 1).alias("qty_fixed"),
        F.date_format(ch.parseDateTimeBestEffort(ts_str), "yyyy-MM-dd HH:mm:ss").alias(
            "reparsed_ts"
        ),
    )


# --------------------------------------------------------------------------
# hash functions (§2.9 row "hash").  md5 is bit-identical across engines and
# carries the oracle; cityHash64 -> xxhash64 intentionally produces
# DIFFERENT values than ClickHouse (documented in ch_functions) so it stays
# out of the hash-compare and is covered by rows-only + unit tests.
# --------------------------------------------------------------------------


@query(
    "scalar_hash_md5",
    oracle="""
SELECT c_custkey, md5(c_name) AS name_md5,
       md5(CAST(c_custkey AS VARCHAR)) AS key_md5
FROM customer
""",
)
def scalar_hash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.md5(F.col("c_custkey").cast("string").cast("binary")).alias("key_md5"),
    )


# --------------------------------------------------------------------------
# Dynamic JSON via Spark 4 VariantType (SURVEY.md §1.3 "Json (dynamic)"):
# parse once into the binary variant encoding, then typed path extraction —
# the scale-correct shape for JSON columns (parse_json runs once per row at
# scan; every downstream variant_get reads the binary encoding instead of
# re-parsing text, unlike repeated get_json_object calls).
# --------------------------------------------------------------------------


@query(
    "scalar_json_variant",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_path
FROM events
""",
)
def scalar_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_path"),
    )


# --------------------------------------------------------------------------
# Typed-path Json columns (ClickHouseJson, reference data_models.py:597-637):
# declared fields are TYPED PATHS (native columns), everything else is the
# dynamic remainder, minus SKIP paths/regexps.  The reflection layer stores
# tables this way (datamodel/reflection.py + catalog/table.py
# _split_json_columns); these helpers are the matching QUERY surface over a
# raw JSON column, and the gate runs the real split machinery with a
# construction-based oracle.
# --------------------------------------------------------------------------


def _json_excluded(x, typed: list[str], skip_paths: list[str], skip_regexps: list[str]):
    cond = x.isin(*[*typed, *skip_paths]) if (typed or skip_paths) else F.lit(False)
    for pat in skip_regexps:
        cond = cond | x.rlike(pat)
    return cond


def json_typed_get(js: Column, path: str, dtype: str) -> Column:
    """A typed path read: extracted and cast once (stored natively when the
    column is reflected through ClickHouseJson)."""
    return F.get_json_object(js, f"$.{path}").cast(dtype)


def json_dynamic_keys(
    js: Column,
    typed: list[str],
    skip_paths: list[str] = [],
    skip_regexps: list[str] = [],
) -> Column:
    """Sorted dynamic-path names: every key that is neither typed nor
    skipped."""
    return F.array_sort(
        F.filter(
            F.json_object_keys(js),
            lambda x: ~_json_excluded(x, typed, skip_paths, skip_regexps),
        )
    )


def json_dynamic_get(
    js: Column,
    path: str,
    typed: list[str],
    skip_paths: list[str] = [],
    skip_regexps: list[str] = [],
) -> Column:
    """A dynamic-path read; SKIPPED paths read as NULL (they are never
    stored — ClickHouse Json SKIP semantics), typed paths also return NULL
    here (read them through their own column)."""
    import re

    if path in typed or path in skip_paths or any(
        re.search(p, path) for p in skip_regexps
    ):
        return F.lit(None).cast("string")
    return F.get_json_object(js, f"$.{path}")


@query(
    "scalar_json_typed_paths",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
       event_type AS et_dynamic,
       CAST(NULL AS VARCHAR) AS val_skipped,
       '[et]' AS dyn_keys
FROM events
""",
)
def scalar_json_typed_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouseJson split semantics end-to-end: build a 3-path JSON doc
    per event (k, et, val), declare k TYPED and val SKIPPED — the query
    surfaces the typed value through the typed read, the dynamic remainder
    through json_dynamic_keys/get, and proves the skip path reads NULL.
    The oracle states the construction-implied expected values."""
    e = t(spark, sf_dir, "events")
    js = F.to_json(
        F.struct(
            F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("k"),
            F.col("event_type").alias("et"),
            F.col("value").alias("val"),
        )
    )
    typed, skips = ["k"], ["val"]
    out = e.select(
        "event_id",
        json_typed_get(js, "k", "bigint").alias("k_typed"),
        json_dynamic_get(js, "et", typed, skips).alias("et_dynamic"),
        json_dynamic_get(js, "val", typed, skips).alias("val_skipped"),
        # driver-canon contract: key array serialized via canon_arrays
        json_dynamic_keys(js, typed, skips).alias("dyn_keys"),
    )
    from moosestack_spark.registry import canon_arrays

    return canon_arrays(out, "dyn_keys")


# --------------------------------------------------------------------------
# CH-dialect SQL surface end-to-end (SURVEY.md §2.9 + §7 "hard part 3"):
# a user's ClickHouse-flavored SQL string runs through translate_ch_sql and
# executes on Spark.  This gates the TRANSLATOR itself — the unit tests
# check string rewrites; this checks the rewritten SQL computes the right
# answer.
# --------------------------------------------------------------------------


@query(
    "sql_ch_dialect_translated",
    oracle="""
SELECT
  strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day_start,
  event_type,
  COUNT(*) AS n,
  COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50) AS k_hi,
  COUNT(DISTINCT user_id) AS users,
  MAX_BY(event_id, ts) AS last_event_id,
  CAST(FLOOR(MAX(value) / 100) AS BIGINT) AS max_bucket
FROM events
GROUP BY date_trunc('day', ts), event_type
""",
)
def sql_ch_dialect_translated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-vocabulary SQL (toStartOfDay, countIf, JSONExtractInt,
    uniqExact, argMax, intDiv) translated and executed by Spark."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["events"])
    ch_sql = """
    SELECT
      date_format(toStartOfDay(ts), 'yyyy-MM-dd HH:mm:ss') AS day_start,
      event_type,
      count(*) AS n,
      countIf(JSONExtractInt(props, 'k') >= 50) AS k_hi,
      uniqExact(user_id) AS users,
      argMax(event_id, ts) AS last_event_id,
      intDiv(max(value), 100) AS max_bucket
    FROM events
    GROUP BY toStartOfDay(ts), event_type
    """
    return spark.sql(translate_ch_sql(ch_sql))


@query(
    "sql_ch_dialect_extended",
    oracle="""
SELECT
  CAST(strftime(ts, '%Y%m') AS INTEGER) AS yyyymm,
  CAST(CASE WHEN dayofweek(ts) = 0 THEN 7 ELSE dayofweek(ts) END AS BIGINT) AS dow,
  CAST(quarter(ts) AS BIGINT) AS q,
  COALESCE(NULLIF(event_type, 'error'), 'ok') AS et,
  CAST(POSITION('a' IN event_type) AS BIGINT) AS pos_a,
  CASE WHEN event_type LIKE 'p%' THEN 1 ELSE 0 END AS starts_p,
  LPAD(event_type, 10, '_') AS padded,
  CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2, 3, 4, 5, 6, 7
""",
)
def sql_ch_dialect_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-3 translator additions exercised end-to-end: toYYYYMM,
    toDayOfWeek (Monday=1 remap), toQuarter, ifNull/nullIf, position
    (swapped-arg locate), startsWith, leftPad.  DuckDB's dayofweek is
    Sunday=0, so the oracle applies the same Monday=1 convention."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["events"])
    ch_sql = """
    SELECT
      toYYYYMM(ts) AS yyyymm,
      toDayOfWeek(ts) AS dow,
      toQuarter(ts) AS q,
      ifNull(nullIf(event_type, 'error'), 'ok') AS et,
      position(event_type, 'a') AS pos_a,
      if(startsWith(event_type, 'p'), 1, 0) AS starts_p,
      leftPad(event_type, 10, '_') AS padded,
      count(*) AS n
    FROM events
    GROUP BY 1, 2, 3, 4, 5, 6, 7
    """
    out = spark.sql(translate_ch_sql(ch_sql))
    return out.select(
        "yyyymm",
        F.col("dow").cast("bigint").alias("dow"),
        F.col("q").cast("bigint").alias("q"),
        "et",
        F.col("pos_a").cast("bigint").alias("pos_a"),
        "starts_p",
        "padded",
        "n",
    )


@query(
    "sql_ch_dialect_url",
    oracle="""
SELECT source || '.example.com' AS host,
       'https' AS proto,
       'com' AS tld,
       '/docs/' || CAST(doc_id AS VARCHAR) AS url_path,
       lang AS lang_param,
       'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
         AS no_query
FROM documents
""",
)
def sql_ch_dialect_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CH URL-function family (domain/protocol/topLevelDomain/path/
    extractURLParameter/cutQueryString) translated end-to-end over synthetic
    well-formed URLs.  The oracle states the EXPECTED semantics directly
    from the URL's construction parts — an independent check, not a DuckDB
    reimplementation of parse_url."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["documents"])
    ch_sql = """
    SELECT
      domain(url) AS host,
      protocol(url) AS proto,
      topLevelDomain(url) AS tld,
      path(url) AS url_path,
      extractURLParameter(url, 'lang') AS lang_param,
      cutQueryString(url) AS no_query
    FROM (
      SELECT concat('https://', source, '.example.com/docs/',
                    toString(doc_id), '?lang=', lang) AS url
      FROM documents
    )
    """
    return spark.sql(translate_ch_sql(ch_sql))


@query(
    "sql_ch_dialect_arrays",
    oracle="""
SELECT o_orderkey,
       '[1,2,3]' AS positions,
       '[' || CAST(c AS VARCHAR) || ',' || CAST(b AS VARCHAR) || ','
           || CAST(a AS VARCHAR) || ']' AS rev,
       '[' || CAST(a AS VARCHAR) || ',' || CAST(a + b AS VARCHAR) || ','
           || CAST(a + b + c AS VARCHAR) || ']' AS cumsum,
       CAST(a + b + c AS BIGINT) AS total,
       '[0,' || CAST(b - a AS VARCHAR) || ','
             || CAST(c - b AS VARCHAR) || ']' AS diffs,
       CAST(a AS VARCHAR) || '-' || CAST(b AS VARCHAR) || '-'
         || CAST(c AS VARCHAR) AS joined
FROM (
  SELECT o_orderkey,
         CAST(o_orderkey % 10 AS BIGINT) AS a,
         CAST(o_orderkey % 7 AS BIGINT) AS b,
         CAST(o_orderkey % 3 AS BIGINT) AS c
  FROM orders
)
""",
)
def sql_ch_dialect_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CH array-function family (arrayEnumerate/arrayReverse/
    arrayCumSum/arraySum/arrayDifference/arrayStringConcat) translated
    end-to-end over constructed 3-element arrays.  The oracle spells the
    EXPECTED outputs directly from the construction scalars (a, b, c) — an
    independent semantic check, not a DuckDB re-implementation."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
    SELECT
      o_orderkey,
      arrayEnumerate(arr) AS positions,
      arrayReverse(arr) AS rev,
      arrayCumSum(arr) AS cumsum,
      arraySum(arr) AS total,
      arrayDifference(arr) AS diffs,
      arrayStringConcat(arr, '-') AS joined
    FROM (
      SELECT o_orderkey,
             array(CAST(o_orderkey % 10 AS BIGINT),
                   CAST(o_orderkey % 7 AS BIGINT),
                   CAST(o_orderkey % 3 AS BIGINT)) AS arr
      FROM orders
    )
    """
    from moosestack_spark.registry import canon_arrays

    return canon_arrays(
        spark.sql(translate_ch_sql(ch_sql)),
        "positions", "rev", "cumsum", "diffs",
    )


@query(
    "sql_ch_dialect_encoding",
    oracle="""
SELECT o_orderkey,
       CAST(a AS VARCHAR) || '.' || CAST(b AS VARCHAR) || '.'
         || CAST(c AS VARCHAR) || '.' || CAST(d AS VARCHAR) AS ip_str,
       CAST(a * 16777216 + b * 65536 + c * 256 + d AS BIGINT) AS ip_num,
       to_base64(encode(tag)) AS b64,
       tag AS b64_rt,
       hex(tag) AS hx,
       tag AS hx_rt
FROM (
  SELECT o_orderkey,
         CAST(o_orderkey % 256 AS BIGINT) AS a,
         CAST((o_orderkey * 7) % 256 AS BIGINT) AS b,
         CAST((o_orderkey * 13) % 256 AS BIGINT) AS c,
         CAST((o_orderkey * 29) % 256 AS BIGINT) AS d,
         'k' || CAST(o_orderkey % 1000 AS VARCHAR) AS tag
  FROM orders
)
""",
)
def sql_ch_dialect_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CH encoding + IP-address families (base64Encode/base64Decode/
    hex/unhex/IPv4NumToString/IPv4StringToNum) translated end-to-end.
    IPv4 values are built from four known byte scalars, so the oracle
    states the expected dotted-quad and packed integer directly from the
    construction parts; base64/hex round-trips must return the original
    tag.  All templates compile to built-in JVM exprs (bit shifts, array
    fold) — no UDF."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
    SELECT
      o_orderkey,
      IPv4NumToString(a * 16777216 + b * 65536 + c * 256 + d) AS ip_str,
      IPv4StringToNum(concat(toString(a), '.', toString(b), '.',
                             toString(c), '.', toString(d))) AS ip_num,
      base64Encode(tag) AS b64,
      base64Decode(base64Encode(tag)) AS b64_rt,
      hex(tag) AS hx,
      unhex(hex(tag)) AS hx_rt
    FROM (
      SELECT o_orderkey,
             CAST(o_orderkey % 256 AS BIGINT) AS a,
             CAST((o_orderkey * 7) % 256 AS BIGINT) AS b,
             CAST((o_orderkey * 13) % 256 AS BIGINT) AS c,
             CAST((o_orderkey * 29) % 256 AS BIGINT) AS d,
             concat('k', toString(o_orderkey % 1000)) AS tag
      FROM orders
    )
    """
    return spark.sql(translate_ch_sql(ch_sql))


@query(
    "sql_ch_dialect_vectors",
    oracle="""
SELECT o_orderkey,
       ((0 + a * b) + b * c) + c * a AS dot,
       ((0 + a) + b) + c AS l1,
       sqrt(((0 + a * a) + b * b) + c * c) AS l2,
       greatest(a, b, c) AS linf,
       1 - (((0 + a * b) + b * c) + c * a)
         / (sqrt(((0 + a * a) + b * b) + c * c)
            * sqrt(((0 + b * b) + c * c) + a * a)) AS cos_dist
FROM (
  SELECT o_orderkey,
         CAST(o_orderkey % 10 + 1 AS DOUBLE) AS a,
         CAST(o_orderkey % 7 + 1 AS DOUBLE) AS b,
         CAST(o_orderkey % 3 + 1 AS DOUBLE) AS c
  FROM orders
)
""",
)
def sql_ch_dialect_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CH vector/distance family (dotProduct, L1Norm, L2Norm, LinfNorm,
    cosineDistance) translated end-to-end over constructed positive
    integer-valued 3-vectors [a,b,c] and [b,c,a].  The oracle spells the
    expected values with the SAME left-fold association the array
    aggregate uses; all intermediate sums/products are exact small
    integers in double, so sqrt/divide see identical operands in both
    engines and even the cosine distance hash-matches."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
    SELECT
      o_orderkey,
      dotProduct(v, w) AS dot,
      L1Norm(v) AS l1,
      L2Norm(v) AS l2,
      LinfNorm(v) AS linf,
      cosineDistance(v, w) AS cos_dist
    FROM (
      SELECT o_orderkey,
             array(CAST(o_orderkey % 10 + 1 AS DOUBLE),
                   CAST(o_orderkey % 7 + 1 AS DOUBLE),
                   CAST(o_orderkey % 3 + 1 AS DOUBLE)) AS v,
             array(CAST(o_orderkey % 7 + 1 AS DOUBLE),
                   CAST(o_orderkey % 3 + 1 AS DOUBLE),
                   CAST(o_orderkey % 10 + 1 AS DOUBLE)) AS w
      FROM orders
    )
    """
    return spark.sql(translate_ch_sql(ch_sql))
