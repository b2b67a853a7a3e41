"""ClickHouse dialect families: geo, rounding/ISO-calendar, string search,
bitmap set-algebra, intervals/timezone, higher-order arrays part 2,
maps + string formatting, bit manipulation / no-throw arithmetic,
DateTime64/UTF8 conversions, and the ARRAY JOIN / PREWHERE clause surface.

Reference parity: the moose SQL surface passes ClickHouse SQL through
verbatim (reference packages/ts-moose-lib sqlHelpers.ts template ->
ClickHouse; SURVEY.md §2.9 establishes the function-vocabulary contract).
These gate queries exercise the translator's newest families end-to-end
over driver tables, each with a value-hash DuckDB oracle; geo uses
generated cross-engine SQL arithmetic (sql/geo.py documents the
bit-exactness argument per function).

Scale: every scalar family is per-row JVM arithmetic inside whole-stage
codegen (zero exchanges beyond the final agg); the bitmap query is two
hash aggregations with map-side partial reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.sql.geo import (
    geohash_decode_sql,
    geohash_encode_sql,
    great_circle_distance_sql,
    point_in_polygon_sql,
)
from moosestack_spark.tables import t

# fixed test polygon (integer vertices — exact cross-product arithmetic)
_POLY = [(2, 1), (15, 3), (18, 12), (9, 16), (1, 9)]

# deterministic synthetic coordinates from o_orderkey: every op below is a
# correctly-rounded IEEE double op, so Spark and DuckDB compute identical
# binary values (see sql/geo.py module docstring)
_LON = "(CAST(o_orderkey % 3600 AS DOUBLE) / 10.0 - 180.0 + 0.05)"
_LAT = "(CAST(o_orderkey % 1700 AS DOUBLE) / 10.0 - 85.0 + 0.05)"


def _geo_sql(engine: str) -> str:
    gh_enc = geohash_encode_sql("lon", "lat", engine)
    gh_lon = geohash_decode_sql("gh", "lon", engine)
    gh_lat = geohash_decode_sql("gh", "lat", engine)
    dist = great_circle_distance_sql("lon", "lat", "2.3522", "48.8566")
    pip = point_in_polygon_sql(
        "(o_orderkey % 21)", "(o_orderkey % 18)", _POLY
    )
    return f"""
WITH pts AS (
  SELECT o_orderkey, {_LON} AS lon, {_LAT} AS lat
  FROM orders WHERE o_orderkey % 7 = 0
), enc AS (
  SELECT o_orderkey, lon, lat, {gh_enc} AS gh FROM pts
)
SELECT o_orderkey,
       gh,
       {gh_lon} AS cell_lon,
       {gh_lat} AS cell_lat,
       CAST({dist} AS FLOAT) AS dist_to_paris_m,
       {pip} AS in_poly
FROM enc
"""


@query("sql_ch_dialect_geo", oracle=_geo_sql("duckdb"))
def sql_ch_dialect_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo family over synthetic per-order coordinates: 6-char geohash,
    decoded cell center (exact dyadic arithmetic — hash-stable doubles),
    great-circle distance to Paris (FLOAT per the transcendental
    determinism policy), and integer ray-cast point-in-polygon.  The Spark
    side runs the SAME generated arithmetic through the translator's
    geohashEncode/greatCircleDistance vocabulary."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    dist_ch = "greatCircleDistance(lon, lat, 2.3522, 48.8566)"
    pip = point_in_polygon_sql("(o_orderkey % 21)", "(o_orderkey % 18)", _POLY)
    ch_sql = f"""
WITH pts AS (
  SELECT o_orderkey, {_LON} AS lon, {_LAT} AS lat
  FROM orders WHERE o_orderkey % 7 = 0
), enc AS (
  SELECT o_orderkey, lon, lat, geohashEncode(lon, lat) AS gh FROM pts
)
SELECT o_orderkey,
       gh,
       {geohash_decode_sql("gh", "lon", "spark")} AS cell_lon,
       {geohash_decode_sql("gh", "lat", "spark")} AS cell_lat,
       CAST({dist_ch} AS FLOAT) AS dist_to_paris_m,
       {pip} AS in_poly
FROM enc
"""
    return spark.sql(translate_ch_sql(ch_sql))


@query(
    "sql_ch_dialect_rounding",
    oracle="""
SELECT o_orderkey,
       round_even(q, 0) AS bankers0,
       round_even(q, 1) AS bankers1,
       CASE WHEN v < 1 THEN 0
            ELSE CAST(power(2, length(bin(CAST(v AS BIGINT))) - 1) AS BIGINT)
       END AS exp2,
       CASE WHEN d < 1 THEN 0
            WHEN d < 10 THEN 1 WHEN d < 30 THEN 10 WHEN d < 60 THEN 30
            WHEN d < 120 THEN 60 WHEN d < 180 THEN 120 WHEN d < 240 THEN 180
            WHEN d < 300 THEN 240 WHEN d < 600 THEN 300
            WHEN d < 1200 THEN 600 WHEN d < 1800 THEN 1200
            WHEN d < 3600 THEN 1800 WHEN d < 7200 THEN 3600
            WHEN d < 18000 THEN 7200 WHEN d < 36000 THEN 18000
            ELSE 36000 END AS dur,
       CASE WHEN a < 1 THEN 0 WHEN a < 18 THEN 17 WHEN a < 25 THEN 18
            WHEN a < 35 THEN 25 WHEN a < 45 THEN 35 WHEN a < 55 THEN 45
            ELSE 55 END AS age_bucket,
       weekofyear(o_orderdate) AS iso_week,
       isoyear(o_orderdate) AS iso_year,
       monthname(o_orderdate) AS month_name
FROM (
  SELECT o_orderkey, o_orderdate,
         CAST(o_orderkey % 1000 AS DOUBLE) / 4 AS q,
         o_orderkey % 100 AS v,
         o_orderkey % 40000 AS d,
         o_orderkey % 100 AS a
  FROM orders
)
""",
)
def sql_ch_dialect_rounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding + ISO-calendar family translated end-to-end.  Banker's
    rounding runs on exact quarter values (k/4 — dyadic, so the tie
    detection is identical in both engines); roundToExp2 / roundDuration /
    roundAge are exact integer ladders; ISO week/year and month names
    agree between Spark's ISO weekofyear/YEAROFWEEK and DuckDB's
    weekofyear/isoyear."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       roundBankers(q, 0) AS bankers0,
       roundBankers(q, 1) AS bankers1,
       roundToExp2(v) AS exp2,
       roundDuration(d) AS dur,
       roundAge(a) AS age_bucket,
       toISOWeek(o_orderdate) AS iso_week,
       toISOYear(o_orderdate) AS iso_year,
       monthName(o_orderdate) AS month_name
FROM (
  SELECT o_orderkey, o_orderdate,
         CAST(o_orderkey % 1000 AS DOUBLE) / 4 AS q,
         o_orderkey % 100 AS v,
         o_orderkey % 40000 AS d,
         o_orderkey % 100 AS a
  FROM orders
)
"""
    return spark.sql(translate_ch_sql(ch_sql))


@query(
    "sql_ch_dialect_search",
    oracle="""
SELECT p_partkey,
       strpos(p_name, 'red') AS pos_red,
       strpos(lower(p_name), lower('RED')) AS pos_red_ci,
       CAST((length(p_name) - length(replace(p_name, 'a', '')))
            / length('a') AS BIGINT) AS n_a,
       (strpos(p_name, 'red') > 0 OR strpos(p_name, 'blue') > 0) AS any_color,
       CASE
         WHEN strpos(p_name, 'red') > 0
          AND (strpos(p_name, 'blue') = 0
               OR strpos(p_name, 'red') <= strpos(p_name, 'blue'))
           THEN 1
         WHEN strpos(p_name, 'blue') > 0
          AND (strpos(p_name, 'red') = 0
               OR strpos(p_name, 'blue') < strpos(p_name, 'red'))
           THEN 2
         ELSE 0
       END AS first_color_idx
FROM part
""",
)
def sql_ch_dialect_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-search family over part names: position,
    positionCaseInsensitive, countSubstrings, multiSearchAny and
    multiSearchFirstIndex (leftmost-occurrence semantics — the oracle
    spells the same argmin-by-position rule with CASE)."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["part"])
    ch_sql = """
SELECT p_partkey,
       position(p_name, 'red') AS pos_red,
       positionCaseInsensitive(p_name, 'RED') AS pos_red_ci,
       countSubstrings(p_name, 'a') AS n_a,
       multiSearchAny(p_name, 'red', 'blue') AS any_color,
       multiSearchFirstIndex(p_name, 'red', 'blue') AS first_color_idx
FROM part
"""
    return spark.sql(translate_ch_sql(ch_sql))


@query(
    "agg_bitmap_cardinalities",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
  FROM events GROUP BY user_id
)
SELECT CAST(SUM(in_a) AS BIGINT) AS card_a,
       CAST(SUM(in_b) AS BIGINT) AS card_b,
       CAST(SUM(in_a * in_b) AS BIGINT) AS card_and,
       CAST(SUM(CASE WHEN in_a = 1 OR in_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS card_or,
       CAST(SUM(in_a * (1 - in_b)) AS BIGINT) AS card_andnot,
       CAST(SUM(CASE WHEN in_a <> in_b THEN 1 ELSE 0 END) AS BIGINT)
         AS card_xor
FROM per_user
""",
)
def agg_bitmap_cardinalities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH bitmap set algebra (bitmapAndCardinality / OrCardinality /
    XorCardinality / AndnotCardinality over groupBitmapState('click') vs
    ('purchase') user segments) re-expressed WITHOUT materializing bitmap
    objects: one groupBy(user) computing membership flags, one global sum.
    This is the scale-first spelling — both aggregations get map-side
    partial reduction, state is O(users) spread across partitions, and no
    operator ever holds a whole segment in memory (a CH bitmap or a
    collect_set spelling would).  Roaring-style compressed bitmaps only
    beat it when segments are reused across many queries — that variant is
    a persisted per-segment table of sorted id runs, same flag-join shape."""
    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "in_b"
        ),
    )
    return per_user.agg(
        F.sum("in_a").cast("bigint").alias("card_a"),
        F.sum("in_b").cast("bigint").alias("card_b"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("card_and"),
        F.sum(
            F.when((F.col("in_a") == 1) | (F.col("in_b") == 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("card_or"),
        F.sum(F.col("in_a") * (1 - F.col("in_b")))
        .cast("bigint")
        .alias("card_andnot"),
        F.sum(F.when(F.col("in_a") != F.col("in_b"), 1).otherwise(0))
        .cast("bigint")
        .alias("card_xor"),
    )


@query(
    "sql_ch_dialect_intervals",
    oracle="""
SELECT event_id,
       strftime(to_timestamp((CAST(epoch(ts) AS BIGINT) // 900) * 900),
                '%Y-%m-%d %H:%M:%S') AS bucket_15m,
       strftime(to_timestamp((CAST(epoch(ts) AS BIGINT) // 21600) * 21600),
                '%Y-%m-%d %H:%M:%S') AS bucket_6h,
       strftime(to_timestamp((CAST(epoch(ts) AS BIGINT) // 172800) * 172800),
                '%Y-%m-%d %H:%M:%S') AS bucket_2d,
       strftime(timezone('America/New_York', ts::TIMESTAMPTZ),
                '%Y-%m-%d %H:%M:%S') AS ny_wall_clock
FROM events
WHERE event_id % 11 = 0
""",
)
def sql_ch_dialect_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """toStartOfInterval (15 min / 6 h / 2 d epoch-aligned floor buckets —
    the CH MV rollup workhorse) and toTimeZone, translated end-to-end.
    Bucket arithmetic is exact integer epoch math in both engines; the
    timezone render targets January data (no DST transition inside the
    window, so JVM and DuckDB tzdb agree)."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["events"])
    ch_sql = """
SELECT event_id,
       toString(toStartOfInterval(ts, INTERVAL 15 MINUTE)) AS bucket_15m,
       toString(toStartOfInterval(ts, INTERVAL 6 HOUR)) AS bucket_6h,
       toString(toStartOfInterval(ts, INTERVAL 2 DAY)) AS bucket_2d,
       formatDateTime(toTimeZone(ts, 'America/New_York'),
                      '%Y-%m-%d %H:%M:%S') AS ny_wall_clock
FROM events
WHERE event_id % 11 = 0
"""
    return spark.sql(translate_ch_sql(ch_sql))


@query(
    "sql_ch_dialect_arrays2",
    oracle="""
SELECT o_orderkey,
       '[' || coalesce(array_to_string(list_transform(
           list_transform(arr, x -> x * 2 + 1),
           v -> CAST(v AS VARCHAR)), ','), '') || ']' AS mapped,
       CAST(len(list_filter(arr, x -> x % 2 = 0)) AS BIGINT) AS n_even,
       len(list_filter(arr, x -> x > 9)) > 0 AS any_big,
       len(list_filter(arr, x -> NOT (x >= 0))) = 0 AS all_nonneg,
       list_filter(arr, x -> x > 4)[1] AS first_big,
       CAST(coalesce(list_position(list_transform(arr, x -> x > 4), true), 0)
            AS BIGINT) AS first_big_idx,
       CAST(coalesce(list_position(arr, 3), 0) AS BIGINT) AS idx_of_3,
       CAST(len(list_filter(arr, x -> x IS NOT DISTINCT FROM k7)) AS BIGINT)
         AS n_eq_k7,
       '[' || coalesce(array_to_string(list_transform(
           list_filter(list_sort(arr), (x, i) -> i = 1
             OR NOT (x IS NOT DISTINCT FROM list_sort(arr)[i - 1])),
           v -> CAST(v AS VARCHAR)), ','), '') || ']' AS compacted,
       (CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), arr),
                         (a, b) -> a + b) AS DOUBLE) / len(arr)) AS avg_v,
       list_min(arr) AS mn, list_max(arr) AS mx,
       '[' || coalesce(array_to_string(list_transform(
           list_sort(list_intersect(arr, [1, 2, 3])),
           v -> CAST(v AS VARCHAR)), ','), '') || ']' AS common,
       '[' || coalesce(array_to_string(list_transform(
           list_concat(arr, [99]),
           v -> CAST(v AS VARCHAR)), ','), '') || ']' AS appended,
       '[' || coalesce(array_to_string(list_transform(
           range(0, (o_orderkey % 4) + 1),
           v -> CAST(v AS VARCHAR)), ','), '') || ']' AS rng
FROM (
  SELECT o_orderkey, o_orderkey % 7 AS k7,
         [o_orderkey % 7, o_orderkey % 5, o_orderkey % 7,
          o_orderkey % 3 + 10] AS arr
  FROM orders WHERE o_orderkey % 13 = 0
)
""",
)
def sql_ch_dialect_arrays2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array family, part 2, translated end-to-end: arrayMap /
    arrayFilter-count / arrayExists / arrayAll / arrayFirst(+Index) /
    indexOf / countEqual / arrayCompact / arrayAvg / arrayMin / arrayMax /
    arrayIntersect (sorted — engines differ on result order) /
    arrayConcat / range.  CH's lambda-first argument order is swapped by
    the translator templates; all values are small exact integers so every
    column value-hash-matches (avg divides an exact sum by 4)."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       arrayMap(x -> x * 2 + 1, arr) AS mapped,
       CAST(arrayCount(x -> x % 2 = 0, arr) AS BIGINT) AS n_even,
       arrayExists(x -> x > 9, arr) AS any_big,
       arrayAll(x -> x >= 0, arr) AS all_nonneg,
       arrayFirst(x -> x > 4, arr) AS first_big,
       arrayFirstIndex(x -> x > 4, arr) AS first_big_idx,
       indexOf(arr, 3) AS idx_of_3,
       CAST(arrayCount(x -> x <=> k7, arr) AS BIGINT) AS n_eq_k7,
       arrayCompact(arraySort(arr)) AS compacted,
       arrayAvg(arr) AS avg_v,
       arrayMin(arr) AS mn, arrayMax(arr) AS mx,
       arraySort(arrayIntersect(arr, array(1L, 2L, 3L))) AS common,
       arrayConcat(arr, array(99L)) AS appended,
       range((o_orderkey % 4) + 1) AS rng
FROM (
  SELECT o_orderkey, o_orderkey % 7 AS k7,
         array(o_orderkey % 7, o_orderkey % 5, o_orderkey % 7,
               o_orderkey % 3 + 10) AS arr
  FROM orders WHERE o_orderkey % 13 = 0
)
"""
    from moosestack_spark.registry import canon_arrays

    return canon_arrays(
        spark.sql(translate_ch_sql(ch_sql)),
        "mapped", "compacted", "common", "appended", "rng",
    )


@query(
    "sql_ch_dialect_maps_format",
    oracle="""
SELECT o_orderkey,
       '[a,b]' AS ks,
       o_orderkey % 5 AS va,
       o_orderkey % 3 AS vb,
       true AS has_a,
       false AS has_z,
       printf('%s-%s', CAST(o_orderkey % 5 AS VARCHAR),
              CAST(o_orderkey % 3 AS VARCHAR)) AS fmt,
       concat_ws('-', 'x', CAST(o_orderkey % 7 AS VARCHAR)) AS joined,
       repeat('ab', CAST(o_orderkey % 3 AS INT)) AS rep,
       reverse(CAST(o_orderkey % 1000 AS VARCHAR)) AS rev,
       array_to_string(
         (string_split('alpha.beta.gamma', '.'))[1:(o_orderkey % 3) + 1],
         '.') AS ssi
FROM orders WHERE o_orderkey % 17 = 0
""",
)
def sql_ch_dialect_maps_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (map constructor, mapKeys/mapValues surfaced as sorted
    arrays, arrayElement lookup, mapContains) and the string-formatting
    family (format with {} placeholders -> format_string, concatWith-
    Separator, repeat, reverse, substringIndex) translated end-to-end; the
    oracle spells the expected values construction-based (same policy as
    sql_ch_dialect_vectors)."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       arraySort(mapKeys(m)) AS ks,
       arrayElement(m, 'a') AS va,
       arrayElement(m, 'b') AS vb,
       mapContains(m, 'a') AS has_a,
       mapContains(m, 'z') AS has_z,
       format('{}-{}', toString(o_orderkey % 5), toString(o_orderkey % 3)) AS fmt,
       concatWithSeparator('-', 'x', toString(o_orderkey % 7)) AS joined,
       repeat('ab', CAST(o_orderkey % 3 AS INT)) AS rep,
       reverse(toString(o_orderkey % 1000)) AS rev,
       substringIndex('alpha.beta.gamma', '.',
                      CAST(o_orderkey % 3 AS INT) + 1) AS ssi
FROM (
  SELECT o_orderkey, map('a', o_orderkey % 5, 'b', o_orderkey % 3) AS m
  FROM orders WHERE o_orderkey % 17 = 0
)
"""
    from moosestack_spark.registry import canon_arrays

    return canon_arrays(spark.sql(translate_ch_sql(ch_sql)), "ks")


@query(
    "sql_ch_dialect_bits_misc",
    oracle="""
SELECT o_orderkey,
       a & b AS band_, a | b AS bor_, xor(a, b) AS bxor_, ~a AS bnot_,
       a << 3 AS shl, a >> 2 AS shr,
       CAST((a >> 5) & 1 AS TINYINT) AS bit5,
       bit_count(a) AS popcnt,
       CASE WHEN b % 7 = 0 THEN 0 ELSE CAST(FLOOR(CAST(a AS DOUBLE) / (b % 7)) AS BIGINT) END AS idoz,
       CASE WHEN b % 7 = 0 THEN 0 ELSE a % (b % 7) END AS modoz,
       power(2, a % 10) AS e2,
       CAST(power(2, a % 10) AS BIGINT) AS ie2,
       (length(s) = 0) AS is_empty,
       '[a,b,c]' AS parts
FROM (
  SELECT o_orderkey,
         CAST(o_orderkey % 1000 AS BIGINT) AS a,
         CAST(o_orderkey % 97 AS BIGINT) AS b,
         CASE WHEN o_orderkey % 5 = 0 THEN '' ELSE 'x' END AS s,
         'a.b.c' AS s2
  FROM orders WHERE o_orderkey % 19 = 0
)
""",
)
def sql_ch_dialect_bits_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-manipulation family (bitAnd/Or/Xor/Not, shifts, bitTest,
    bitCount), CH's no-throw arithmetic (intDivOrZero/moduloOrZero),
    exp2/intExp2, empty, and splitByString — translated end-to-end over
    exact integer inputs."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       bitAnd(a, b) AS band_, bitOr(a, b) AS bor_, bitXor(a, b) AS bxor_,
       bitNot(a) AS bnot_,
       bitShiftLeft(a, 3) AS shl, bitShiftRight(a, 2) AS shr,
       bitTest(a, 5) AS bit5,
       bitCount(a) AS popcnt,
       intDivOrZero(a, modulo(b, 7)) AS idoz,
       moduloOrZero(a, modulo(b, 7)) AS modoz,
       exp2(modulo(a, 10)) AS e2,
       intExp2(modulo(a, 10)) AS ie2,
       empty(s) AS is_empty,
       splitByString('.', s2) AS parts
FROM (
  SELECT o_orderkey,
         CAST(o_orderkey % 1000 AS BIGINT) AS a,
         CAST(o_orderkey % 97 AS BIGINT) AS b,
         if(o_orderkey % 5 = 0, '', 'x') AS s,
         'a.b.c' AS s2
  FROM orders WHERE o_orderkey % 19 = 0
)
"""
    from moosestack_spark.registry import canon_arrays

    return canon_arrays(spark.sql(translate_ch_sql(ch_sql)), "parts")


@query(
    "sql_ch_dialect_datetime64",
    oracle="""
SELECT event_id,
       epoch_ms(ts) AS ms,
       epoch_us(ts) AS us,
       strftime(make_timestamp(epoch_us(ts)), '%Y-%m-%d %H:%M:%S')
         AS us_roundtrip,
       strftime(to_timestamp((CAST(epoch(ts) AS BIGINT) // 1800) * 1800),
                '%Y-%m-%d %H:%M:%S') AS slot_30m,
       date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts) AS age_min,
       length('héllo') AS len_utf8,
       strpos('héllo', 'llo') AS pos_utf8,
       ltrim('  x ') AS ltrimmed,
       rtrim('  x ') AS rtrimmed
FROM events WHERE event_id % 29 = 0
""",
)
def sql_ch_dialect_datetime64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DateTime64 epoch conversions (toUnixTimestamp64Milli/Micro + the
    micro roundtrip), timeSlot (30-minute floor), age in complete minutes,
    and the UTF8-suffixed string aliases (Spark strings are codepoint-based
    already — lengthUTF8('héllo') = 5, not the byte count)."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["events"])
    ch_sql = """
SELECT event_id,
       toUnixTimestamp64Milli(ts) AS ms,
       toUnixTimestamp64Micro(ts) AS us,
       formatDateTime(fromUnixTimestamp64Micro(toUnixTimestamp64Micro(ts)),
                      '%Y-%m-%d %H:%M:%S') AS us_roundtrip,
       toString(timeSlot(ts)) AS slot_30m,
       age('minute', parseDateTime('2024-01-01 00:00:00'), ts) AS age_min,
       lengthUTF8('héllo') AS len_utf8,
       positionUTF8('héllo', 'llo') AS pos_utf8,
       trimLeft('  x ') AS ltrimmed,
       trimRight('  x ') AS rtrimmed
FROM events WHERE event_id % 29 = 0
"""
    return spark.sql(translate_ch_sql(ch_sql))


@query(
    "sql_ch_dialect_array_join_clause",
    oracle="""
SELECT o_orderkey, x
FROM (
  SELECT o_orderkey, [o_orderkey % 5, o_orderkey % 3, o_orderkey % 2] AS arr
  FROM orders WHERE o_orderkey % 31 = 0
), UNNEST(arr) AS t(x)
""",
)
def sql_ch_dialect_array_join_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ClickHouse ``ARRAY JOIN`` CLAUSE (not the arrayJoin function):
    unnests an array column in the FROM position, translated to LATERAL
    VIEW explode in the same syntactic slot.  Also exercises the PREWHERE
    (folded into WHERE — Catalyst pushes it down anyway) and trailing
    SETTINGS (stripped) clause handling."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey, x
FROM (
  SELECT o_orderkey, array(o_orderkey % 5, o_orderkey % 3, o_orderkey % 2) AS arr
  FROM orders PREWHERE o_orderkey % 31 = 0
) ARRAY JOIN arr AS x
SETTINGS max_threads=8
"""
    return spark.sql(translate_ch_sql(ch_sql))


@query(
    "sql_ch_dialect_time_windows",
    oracle="""
SELECT event_id,
       strftime(to_timestamp((CAST(epoch(ts) AS BIGINT) // 1800) * 1800),
                '%Y-%m-%d %H:%M:%S') AS t_start,
       strftime(to_timestamp((CAST(epoch(ts) AS BIGINT) // 1800) * 1800 + 1800),
                '%Y-%m-%d %H:%M:%S') AS t_end,
       strftime(to_timestamp((CAST(epoch(ts) AS BIGINT) // 600) * 600 - 1800 + 600),
                '%Y-%m-%d %H:%M:%S') AS h_start,
       strftime(to_timestamp((CAST(epoch(ts) AS BIGINT) // 600) * 600 + 600),
                '%Y-%m-%d %H:%M:%S') AS h_end
FROM events WHERE event_id % 23 = 0
""",
)
def sql_ch_dialect_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH WindowView time-window scalar family translated end-to-end:
    tumbleStart/tumbleEnd (30-minute epoch-aligned windows) and
    hopStart/hopEnd (10-minute hop, 30-minute window — the EARLIEST
    hopping window containing the timestamp).  The oracle restates the
    epoch arithmetic directly; all outputs serialize as wall-clock
    strings (driver-canon + engine-timezone safe)."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["events"])
    ch_sql = """
SELECT event_id,
       formatDateTime(tumbleStart(ts, INTERVAL 30 MINUTE), '%Y-%m-%d %H:%i:%S') AS t_start,
       formatDateTime(tumbleEnd(ts, INTERVAL 30 MINUTE), '%Y-%m-%d %H:%i:%S') AS t_end,
       formatDateTime(hopStart(ts, INTERVAL 10 MINUTE, INTERVAL 30 MINUTE),
                      '%Y-%m-%d %H:%i:%S') AS h_start,
       formatDateTime(hopEnd(ts, INTERVAL 10 MINUTE, INTERVAL 30 MINUTE),
                      '%Y-%m-%d %H:%i:%S') AS h_end
FROM events WHERE event_id % 23 = 0
"""
    return spark.sql(translate_ch_sql(ch_sql))


@query(
    "sql_ch_dialect_transform_case",
    oracle="""
SELECT o_orderkey,
       CASE o_orderkey % 5 WHEN 0 THEN 100 WHEN 1 THEN 200
            ELSE CAST(-1 AS BIGINT) END AS mapped_val,
       CASE WHEN o_orderkey % 3 = 0 THEN 'zero'
            WHEN o_orderkey % 3 = 1 THEN 'one' ELSE 'other' END AS case_expr,
       '[' || coalesce(array_to_string(list_transform(
           CASE WHEN len(arr) >= 5 THEN arr[1:5]
                ELSE list_concat(arr, [CAST(9 AS BIGINT)
                     FOR _ IN range(5 - len(arr))]) END,
           v -> CAST(v AS VARCHAR)), ','), '') || ']' AS resized,
       '[' || coalesce(array_to_string(list_transform(
           list_append(arr, 77), v -> CAST(v AS VARCHAR)), ','), '')
           || ']' AS pushed,
       '[' || coalesce(array_to_string(list_transform(
           arr[2:len(arr)], v -> CAST(v AS VARCHAR)), ','), '')
           || ']' AS popped,
       '[' || coalesce(array_to_string(list_transform(
           [1, CASE WHEN arr[2] = arr[1] THEN 2 ELSE 1 END,
            CASE WHEN arr[2] = arr[1] THEN 3 ELSE 2 END],
           v -> CAST(v AS VARCHAR)), ','), '') || ']' AS occ,
       strftime(to_timestamp(o_orderkey % 100000 + 1500000000),
                '%Y-%m-%d %H:%M:%S') AS from_unix
FROM (
  SELECT o_orderkey,
         [o_orderkey % 7, o_orderkey % 5, o_orderkey % 7] AS arr
  FROM orders WHERE o_orderkey % 29 = 0
)
""",
)
def sql_ch_dialect_transform_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH value-mapping transform() (NOT Spark's lambda transform — the
    translator disambiguates on arity), caseWithExpression, arrayResize /
    arrayPushBack / arrayPopFront, arrayEnumerateUniq, and 1-arg
    fromUnixTimestamp, all end-to-end.  The oracle restates expected
    values from the construction: arr[0]==arr[2] always (both o%7), so
    occ's third element is 2, bumping to 3 when the middle element ties
    too.  Array outputs serialize per driver-canon."""
    from moosestack_spark.registry import canon_arrays
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       transform(o_orderkey % 5, array(0L, 1L), array(100L, 200L), -1L)
         AS mapped_val,
       caseWithExpression(o_orderkey % 3, 0, 'zero', 1, 'one', 'other')
         AS case_expr,
       arrayResize(arr, 5, 9L) AS resized,
       arrayPushBack(arr, 77L) AS pushed,
       arrayPopFront(arr) AS popped,
       arrayEnumerateUniq(arr) AS occ,
       formatDateTime(fromUnixTimestamp(o_orderkey % 100000 + 1500000000),
                      '%Y-%m-%d %H:%i:%S') AS from_unix
FROM (
  SELECT o_orderkey,
         array(o_orderkey % 7, o_orderkey % 5, o_orderkey % 7) AS arr
  FROM orders WHERE o_orderkey % 29 = 0
)
"""
    return canon_arrays(
        spark.sql(translate_ch_sql(ch_sql)),
        "resized", "pushed", "popped", "occ",
    )


@query(
    "sql_ch_dialect_vocab_r5",
    oracle="""
SELECT o_orderkey,
       left(nm, 4) AS l4,
       right(nm, 3) AS r3,
       strftime(CAST(date_trunc('quarter', o_orderdate) AS DATE), '%Y-%m-%d')
         AS q_start,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       ((a << 3) | (a >> 61)) AS rotl3,
       length(CAST(a AS VARCHAR)) AS bsz,
       CAST(CAST(CAST(o_orderkey % 1000 AS DOUBLE) / 4 AS DECIMAL(18,2))
            AS VARCHAR) AS dec2,
       CASE WHEN a % 7 - 3 > 0 THEN 1.0 WHEN a % 7 - 3 < 0 THEN -1.0
            ELSE 0.0 END AS sgn,
       levenshtein('k' || CAST(a % 100 AS VARCHAR),
                   'k' || CAST(a % 10 AS VARCHAR)) AS lev,
       isnan(1e308 * 10 - 1e308 * 10) AS is_nan,
       false AS fin_inf,
       true AS fin_one,
       (1e308 * 10 = 1e308 * 10) AS is_inf
FROM (
  SELECT o_orderkey, o_orderdate,
         CAST(o_orderkey % 1000 AS BIGINT) AS a,
         'part-' || CAST(o_orderkey % 97 AS VARCHAR) AS nm
  FROM orders WHERE o_orderkey % 31 = 0
)
""",
)
def sql_ch_dialect_vocab_r5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 vocabulary widening end-to-end: left/right,
    toStartOfQuarter, toLastDayOfMonth, bitRotateLeft, toDecimal64,
    sign, levenshteinDistance, and the isNaN/isFinite/
    isInfinite classifiers (NaN built as inf - inf, infinity as double
    overflow — pure IEEE arithmetic, no ANSI division error)."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       left(nm, 4) AS l4,
       right(nm, 3) AS r3,
       formatDateTime(toStartOfQuarter(o_orderdate), '%F') AS q_start,
       formatDateTime(toLastDayOfMonth(o_orderdate), '%F') AS month_end,
       bitRotateLeft(a, 3) AS rotl3,
       length(toString(a)) AS bsz,
       toString(toDecimal64(CAST(o_orderkey % 1000 AS DOUBLE) / 4, 2)) AS dec2,
       sign(a % 7 - 3) AS sgn,
       levenshteinDistance(concat('k', toString(a % 100)),
                           concat('k', toString(a % 10))) AS lev,
       isNaN(1e308 * 10 - 1e308 * 10) AS is_nan,
       isFinite(1e308 * 10) AS fin_inf,
       isFinite(1.0) AS fin_one,
       isInfinite(1e308 * 10) AS is_inf
FROM (
  SELECT o_orderkey, o_orderdate,
         CAST(o_orderkey % 1000 AS BIGINT) AS a,
         concat('part-', toString(o_orderkey % 97)) AS nm
  FROM orders WHERE o_orderkey % 31 = 0
)
"""
    return spark.sql(translate_ch_sql(ch_sql))


@query(
    "sql_ch_dialect_parametric",
    oracle="""
SELECT l_returnflag,
       quantile_cont(cents, 0.5) AS med_cents,
       quantile_cont(cents, 0.25) AS q25,
       quantile_cont(cents, 0.75) AS q75,
       least(COUNT(DISTINCT l_linenumber), 4) AS uniq3,
       '[' || coalesce(array_to_string(list_transform(
           (list_sort(list(cents)))[1:3], v -> CAST(v AS VARCHAR)), ','), '')
           || ']' AS smallest3
FROM (
  SELECT l_returnflag, l_linenumber,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM lineitem WHERE l_orderkey % 37 = 0
)
GROUP BY l_returnflag
""",
)
def sql_ch_dialect_parametric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH parametric-aggregate call syntax f(params)(args) translated
    end-to-end: quantileExact(p)(x) / quantilesExact(..)(x) (classic
    (n-1)p interpolation — identical on integer cents in both engines:
    the fraction is dyadic, the lerp exact), uniqUpTo(3)(x), and
    groupArraySorted(3)(x) (canon-serialized).  Before the parametric
    branch landed, quantile(0.9)(x) silently emitted broken SQL."""
    from moosestack_spark.registry import canon_arrays
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["lineitem"])
    ch_sql = """
SELECT l_returnflag,
       quantileExact(0.5)(cents) AS med_cents,
       arrayElement(quantilesExact(0.25, 0.75)(cents), 1) AS q25,
       arrayElement(quantilesExact(0.25, 0.75)(cents), 2) AS q75,
       uniqUpTo(3)(l_linenumber) AS uniq3,
       groupArraySorted(3)(cents) AS smallest3
FROM (
  SELECT l_returnflag, l_linenumber,
         toInt64(toDecimal64(l_extendedprice, 2) * 100) AS cents
  FROM lineitem WHERE l_orderkey % 37 = 0
)
GROUP BY l_returnflag
"""
    return canon_arrays(spark.sql(translate_ch_sql(ch_sql)), "smallest3")


@query(
    "sql_ch_dialect_vocab_r6",
    oracle="""
SELECT o_orderkey,
       levenshtein(nm, nm2) AS ed,
       translate(nm, 'part', 'PART') AS tr,
       array_to_string(list_transform(string_split(nm, ' '),
           w -> upper(substr(w, 1, 1)) || lower(substr(w, 2))), ' ') AS ic,
       jaccard(nm, nm2) AS jac,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mstart,
       e - e % 300 AS m5,
       e - e % 600 AS m10,
       strftime(CAST(o_orderdate AS DATE) + CAST((8 - (dayofweek(o_orderdate)
           + 1)) % 7 AS INTEGER), '%Y-%m-%d') AS ldow,
       list_aggregate(darr, 'product') AS aprod,
       CAST(length(list_distinct(arr)) AS INT) AS auniq,
       '[' || array_to_string(list_reverse(list_sort(arr)), ',') || ']' AS arsort,
       '[' || array_to_string([arr[1], arr[2], arr[2], arr[3], arr[3], arr[4]],
           ',') || ']' AS aflat,
       array_to_string(list_transform(
           [[arr[1], arr[2]], [arr[2], arr[3]], [arr[3], arr[4]]],
           s -> array_to_string(s, '-')), '|') AS ashing,
       '[' || array_to_string(list_concat(arr[(k % 4 + 1):], arr[:(k % 4)]),
           ',') || ']' AS arotl,
       '[' || array_to_string(list_concat(arr[(5 - k % 4):], arr[:(4 - k % 4)]),
           ',') || ']' AS arotr,
       a AS tel,
       CAST(bit_count(CAST(xor(a, b) AS BIGINT)) AS INT) AS bham,
       least(greatest(a, 100), 900) AS cl,
       '[' || array_to_string(list_filter(regexp_split_to_array(txt, '\\s+'),
           x -> x != ''), ',') || ']' AS swsp,
       '[' || array_to_string(list_filter(regexp_split_to_array(txt,
           '[^A-Za-z]+'), x -> x != ''), ',') || ']' AS atok
FROM (
  SELECT o_orderkey, o_orderdate,
         CAST(o_orderkey % 1000 AS BIGINT) AS a,
         CAST(o_orderkey % 787 AS BIGINT) AS b,
         CAST(800000000 + o_orderkey % 100000 AS BIGINT) AS e,
         CAST(o_orderkey % 5 AS BIGINT) AS k,
         'part ' || CAST(o_orderkey % 97 AS VARCHAR) AS nm,
         'par ' || CAST(o_orderkey % 89 AS VARCHAR) AS nm2,
         [CAST(o_orderkey % 7 AS BIGINT), CAST(o_orderkey % 5 + 1 AS BIGINT),
          CAST(o_orderkey % 3 + 2 AS BIGINT), CAST(o_orderkey % 7 AS BIGINT)]
             AS arr,
         [CAST(o_orderkey % 5 + 1 AS DOUBLE), CAST(o_orderkey % 4 + 1 AS DOUBLE),
          CAST(o_orderkey % 3 + 1 AS DOUBLE)] AS darr,
         'part ' || CAST(o_orderkey % 97 AS VARCHAR) || ' 42  par '
             || CAST(o_orderkey % 89 AS VARCHAR) AS txt
  FROM orders WHERE o_orderkey % 41 = 0
)
""",
)
def sql_ch_dialect_vocab_r6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6 vocabulary widening end-to-end: editDistance, translate,
    initcap, stringJaccardIndex (distinct-char Jaccard, byte==char on
    ASCII), dateTrunc, fromUnixTimestamp/toStartOfFive|TenMinutes (pinned
    via epoch arithmetic, timezone-free), toLastDayOfWeek (mode-0 Sunday),
    arrayProduct/Uniq/ReverseSort/Flatten/Shingles/RotateLeft|Right,
    tuple+tupleElement (named_struct colN fields), bitHammingDistance,
    clamp, splitByWhitespace, alphaTokens."""
    from moosestack_spark.registry import canon_arrays
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       editDistance(nm, nm2) AS ed,
       translate(nm, 'part', 'PART') AS tr,
       initcap(nm) AS ic,
       stringJaccardIndex(nm, nm2) AS jac,
       formatDateTime(dateTrunc('month', o_orderdate), '%F') AS mstart,
       toUnixTimestamp(toStartOfFiveMinutes(fromUnixTimestamp(e))) AS m5,
       toUnixTimestamp(toStartOfTenMinutes(fromUnixTimestamp(e))) AS m10,
       formatDateTime(toLastDayOfWeek(o_orderdate), '%F') AS ldow,
       arrayProduct(darr) AS aprod,
       arrayUniq(arr) AS auniq,
       arrayReverseSort(arr) AS arsort,
       arrayFlatten(arrayShingles(arr, 2)) AS aflat,
       arrayStringConcat(arrayMap(s -> arrayStringConcat(s, '-'),
           arrayShingles(arr, 2)), '|') AS ashing,
       arrayRotateLeft(arr, k) AS arotl,
       arrayRotateRight(arr, k) AS arotr,
       tupleElement(tuple(a, nm), 1) AS tel,
       bitHammingDistance(a, b) AS bham,
       clamp(a, 100, 900) AS cl,
       splitByWhitespace(txt) AS swsp,
       alphaTokens(txt) AS atok
FROM (
  SELECT o_orderkey, o_orderdate,
         CAST(o_orderkey % 1000 AS BIGINT) AS a,
         CAST(o_orderkey % 787 AS BIGINT) AS b,
         CAST(800000000 + o_orderkey % 100000 AS BIGINT) AS e,
         CAST(o_orderkey % 5 AS BIGINT) AS k,
         concat('part ', toString(o_orderkey % 97)) AS nm,
         concat('par ', toString(o_orderkey % 89)) AS nm2,
         array(CAST(o_orderkey % 7 AS BIGINT),
               CAST(o_orderkey % 5 + 1 AS BIGINT),
               CAST(o_orderkey % 3 + 2 AS BIGINT),
               CAST(o_orderkey % 7 AS BIGINT)) AS arr,
         array(CAST(o_orderkey % 5 + 1 AS DOUBLE),
               CAST(o_orderkey % 4 + 1 AS DOUBLE),
               CAST(o_orderkey % 3 + 1 AS DOUBLE)) AS darr,
         concat('part ', toString(o_orderkey % 97), ' 42  par ',
                toString(o_orderkey % 89)) AS txt
  FROM orders WHERE o_orderkey % 41 = 0
)
"""
    return canon_arrays(
        spark.sql(translate_ch_sql(ch_sql)),
        "arsort", "aflat", "arotl", "arotr", "swsp", "atok",
    )


@query(
    "sql_ch_dialect_vocab_r6b",
    oracle=r"""
SELECT o_orderkey,
       a AS td,
       monthname(o_orderdate) AS dn_m,
       dayname(o_orderdate) AS dn_w,
       CAST(year(o_orderdate) AS VARCHAR) AS dn_y,
       e AS sos,
       CAST(epoch_ms(tsm) % 1000 AS INT) AS msec,
       CAST(datediff('day', DATE '1970-01-01', o_orderdate) + 719528
            AS INT) AS dz,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS fdz,
       regexp_extract(nm, 'part ([0-9]+)', 1) AS rex,
       CASE WHEN regexp_full_match(ipstr,
         '((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)')
         THEN 1 ELSE 0 END AS ipv,
       COALESCE(array_to_string(list_transform(list_filter(range(0, 63),
         i -> ((a >> i) & 1) = 1),
         i -> CAST((CAST(1 AS BIGINT) << i) AS VARCHAR)), ','), '') AS bml,
       CAST(CASE WHEN a < 0 THEN 0 WHEN a >= 1000 THEN 11
            ELSE CAST(FLOOR((CAST(a AS DOUBLE) - 0) / (1000 - 0) * 10)
                 AS BIGINT) + 1 END AS BIGINT) AS wb,
       CAST(len(list_filter(list_distinct(arr),
              x -> list_contains(list_distinct(arr2), x))) AS DOUBLE)
         / (len(list_distinct(arr)) + len(list_distinct(arr2))
            - len(list_filter(list_distinct(arr),
                x -> list_contains(list_distinct(arr2), x)))) AS ajac,
       CAST(len(list_filter(range(1, greatest(length(nm), length(nm2)) + 1),
         i -> string_split(nm, '')[i] IS DISTINCT FROM
              string_split(nm2, '')[i])) AS INT) AS ham,
       substr(nm, 2, 3) AS md,
       '[' || array_to_string(list_transform(['part', 'zzz', '42'],
         n -> CAST(strpos(txt, n) AS VARCHAR)), ',') || ']' AS msp,
       CASE WHEN len(arr[2:3]) > len(arr) THEN 0
            WHEN len(list_filter(range(1, len(arr) - len(arr[2:3]) + 2),
              i -> arr[i : i + len(arr[2:3]) - 1] = arr[2:3])) > 0
            THEN 1 ELSE 0 END AS hs,
       0 AS hs2,
       array_to_string(list_filter(
         string_split_regex(txt, '[^A-Za-z0-9]+'), x -> x != ''), ',') AS tk,
       array_to_string(string_split_regex(nm, '[0-9]+'), '|') AS sbr,
       list_dot_product(darr, darr2) AS adp,
       CASE WHEN e < 1048576 THEN NULL
            WHEN e < 1073741824 THEN
              CAST(CAST(e / 1048576 AS DECIMAL(20,2)) AS VARCHAR) || ' MiB'
            ELSE NULL END AS frs,
       CAST(CAST(a AS DECIMAL(20,2)) AS VARCHAR) || ' B' AS frs2,
       CAST(CAST(e / 1000000 AS DECIMAL(20,2)) AS VARCHAR)
         || ' million' AS frq,
       repeat('█', CAST(FLOOR(least(greatest(
           (CAST(a AS DOUBLE) - (0)) / ((1000) - (0)) * (10),
           CAST(0 AS DOUBLE)), CAST((10) AS DOUBLE))) AS INT))
         || ['','▏','▎','▍','▌','▋','▊','▉'][
              CAST(FLOOR((least(greatest(
                (CAST(a AS DOUBLE) - (0)) / ((1000) - (0)) * (10),
                CAST(0 AS DOUBLE)), CAST((10) AS DOUBLE))
                - FLOOR(least(greatest(
                (CAST(a AS DOUBLE) - (0)) / ((1000) - (0)) * (10),
                CAST(0 AS DOUBLE)), CAST((10) AS DOUBLE)))) * 8) AS INT) + 1]
         AS br,
       nm || nm2 AS cai,
       upper(substr(nm, 1, 1)) || lower(substr(nm, 2)) AS icu
FROM (
  SELECT o_orderkey, o_orderdate,
         CAST(o_orderkey % 1000 AS BIGINT) AS a,
         CAST(800000000 + o_orderkey % 100000 AS BIGINT) AS e,
         make_timestamp(((800000000 + o_orderkey % 100000) * 1000
            + o_orderkey % 1000) * 1000) AS tsm,
         CASE WHEN o_orderkey % 2 = 0
              THEN '10.' || CAST(o_orderkey % 256 AS VARCHAR) || '.0.'
                   || CAST(o_orderkey % 200 AS VARCHAR)
              ELSE '299.1.2.' || CAST(o_orderkey % 99 AS VARCHAR) END
           AS ipstr,
         'part ' || CAST(o_orderkey % 97 AS VARCHAR) AS nm,
         'par ' || CAST(o_orderkey % 89 AS VARCHAR) AS nm2,
         [CAST(o_orderkey % 7 AS BIGINT), CAST(o_orderkey % 5 + 1 AS BIGINT),
          CAST(o_orderkey % 3 + 2 AS BIGINT), CAST(o_orderkey % 7 AS BIGINT)]
           AS arr,
         [CAST(o_orderkey % 5 + 1 AS BIGINT), CAST(o_orderkey % 3 + 2 AS BIGINT),
          CAST(11 AS BIGINT)] AS arr2,
         [CAST(o_orderkey % 5 + 1 AS DOUBLE), CAST(o_orderkey % 4 + 1 AS DOUBLE),
          CAST(o_orderkey % 3 + 1 AS DOUBLE)] AS darr,
         [CAST(o_orderkey % 6 + 1 AS DOUBLE), CAST(o_orderkey % 7 + 1 AS DOUBLE),
          CAST(o_orderkey % 2 + 1 AS DOUBLE)] AS darr2,
         'part ' || CAST(o_orderkey % 97 AS VARCHAR) || ' 42  par '
           || CAST(o_orderkey % 89 AS VARCHAR) AS txt
  FROM orders WHERE o_orderkey % 43 = 0
)
""",
)
def sql_ch_dialect_vocab_r6b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6b vocabulary widening end-to-end: timeDiff, dateName,
    toStartOfSecond/toMillisecond, to/fromDaysSinceYearZero (CH epoch day
    719528), regexpExtract, isIPv4String, bitmaskToList, widthBucket,
    arrayJaccardIndex, hammingDistance (byte-level), mid,
    multiSearchAllPositions, hasSubstr, tokens, splitByRegexp,
    arrayDotProduct, formatReadableSize/Quantity (CH unit ladders,
    2-decimal rendering), bar (eighth-block unicode rendering),
    concatAssumeInjective, initcapUTF8."""
    from moosestack_spark.registry import canon_arrays
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       timeDiff(fromUnixTimestamp(e), fromUnixTimestamp(e + a)) AS td,
       dateName('month', o_orderdate) AS dn_m,
       dateName('weekday', o_orderdate) AS dn_w,
       dateName('year', o_orderdate) AS dn_y,
       toUnixTimestamp(toStartOfSecond(tsm)) AS sos,
       toMillisecond(tsm) AS msec,
       toDaysSinceYearZero(o_orderdate) AS dz,
       formatDateTime(fromDaysSinceYearZero(toDaysSinceYearZero(o_orderdate)),
           '%F') AS fdz,
       regexpExtract(nm, 'part ([0-9]+)', 1) AS rex,
       isIPv4String(ipstr) AS ipv,
       bitmaskToList(a) AS bml,
       widthBucket(a, 0, 1000, 10) AS wb,
       arrayJaccardIndex(arr, arr2) AS ajac,
       hammingDistance(nm, nm2) AS ham,
       mid(nm, 2, 3) AS md,
       multiSearchAllPositions(txt, array('part', 'zzz', '42')) AS msp,
       if(hasSubstr(arr, arraySlice(arr, 2, 2)), 1, 0) AS hs,
       if(hasSubstr(arr, array(CAST(99 AS BIGINT))), 1, 0) AS hs2,
       arrayStringConcat(tokens(txt), ',') AS tk,
       arrayStringConcat(splitByRegexp('[0-9]+', nm), '|') AS sbr,
       arrayDotProduct(darr, darr2) AS adp,
       formatReadableSize(e) AS frs,
       formatReadableSize(a) AS frs2,
       formatReadableQuantity(e) AS frq,
       bar(a, 0, 1000, 10) AS br,
       concatAssumeInjective(nm, nm2) AS cai,
       initcapUTF8(nm) AS icu
FROM (
  SELECT o_orderkey, o_orderdate,
         CAST(o_orderkey % 1000 AS BIGINT) AS a,
         CAST(800000000 + o_orderkey % 100000 AS BIGINT) AS e,
         timestamp_millis((800000000 + o_orderkey % 100000) * 1000
            + o_orderkey % 1000) AS tsm,
         CASE WHEN o_orderkey % 2 = 0
              THEN concat('10.', toString(o_orderkey % 256), '.0.',
                   toString(o_orderkey % 200))
              ELSE concat('299.1.2.', toString(o_orderkey % 99)) END
           AS ipstr,
         concat('part ', toString(o_orderkey % 97)) AS nm,
         concat('par ', toString(o_orderkey % 89)) AS nm2,
         array(CAST(o_orderkey % 7 AS BIGINT),
               CAST(o_orderkey % 5 + 1 AS BIGINT),
               CAST(o_orderkey % 3 + 2 AS BIGINT),
               CAST(o_orderkey % 7 AS BIGINT)) AS arr,
         array(CAST(o_orderkey % 5 + 1 AS BIGINT),
               CAST(o_orderkey % 3 + 2 AS BIGINT),
               CAST(11 AS BIGINT)) AS arr2,
         array(CAST(o_orderkey % 5 + 1 AS DOUBLE),
               CAST(o_orderkey % 4 + 1 AS DOUBLE),
               CAST(o_orderkey % 3 + 1 AS DOUBLE)) AS darr,
         array(CAST(o_orderkey % 6 + 1 AS DOUBLE),
               CAST(o_orderkey % 7 + 1 AS DOUBLE),
               CAST(o_orderkey % 2 + 1 AS DOUBLE)) AS darr2,
         concat('part ', toString(o_orderkey % 97), ' 42  par ',
                toString(o_orderkey % 89)) AS txt
  FROM orders WHERE o_orderkey % 43 = 0
)
"""
    out = spark.sql(translate_ch_sql(ch_sql))
    out = canon_arrays(out, "msp")
    return out.withColumn("wb", F.col("wb").cast("bigint")).withColumn(
        "dz", F.col("dz").cast("int")
    ).withColumn("ham", F.col("ham").cast("int"))


@query(
    "agg_sparkbar_hours",
    oracle="""
WITH pts AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS bin FROM events
),
cnt AS (
  SELECT event_type, bin, COUNT(*) AS s FROM pts GROUP BY event_type, bin
),
keys AS (SELECT DISTINCT event_type FROM cnt),
bins AS (SELECT i FROM UNNEST(range(0, 24)) AS t(i)),
dense AS (
  SELECT k.event_type, b.i, COALESCE(c.s, 0) AS s
  FROM keys k CROSS JOIN bins b
  LEFT JOIN cnt c ON c.event_type = k.event_type AND c.bin = b.i
),
mx AS (SELECT event_type, MAX(s) AS m FROM dense GROUP BY event_type),
lv AS (
  SELECT d.event_type, d.i,
         CASE WHEN d.s <= 0 THEN ' '
              ELSE ['▁','▂','▃','▄','▅','▆','▇','█'][
                CAST(CEIL(d.s * 8.0 / m.m) AS INT)] END AS ch
  FROM dense d JOIN mx m USING (event_type)
)
SELECT event_type, string_agg(ch, '' ORDER BY i) AS spark_hours
FROM lv GROUP BY event_type
""",
)
def agg_sparkbar_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH sparkbar: per event type, the 24-bin hour-of-day activity
    profile rendered as U+2581..2588 eighth-blocks (empty bin = space,
    level = ceil(8 * bin_count / max_count) — integer counts, one
    exactly-rounded division, so the rendered string hash-matches).
    One groupBy on (key, bin) + one per-key fold; the render is a
    map-lookup transform over a 24-element sequence, no extra shuffle."""
    ev = t(spark, sf_dir, "events")
    cnt = ev.select(
        "event_type", F.hour("ts").cast("int").alias("bin")
    ).groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("s"))
    agg = cnt.groupBy("event_type").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bin"), F.col("s")))
        ).alias("m"),
        F.max("s").alias("mx"),
    )
    chars = F.expr(
        "array_join(transform(sequence(0, 23), i -> "
        "CASE WHEN element_at(m, i) IS NULL OR element_at(m, i) <= 0 "
        "THEN ' ' ELSE element_at(array('▁','▂','▃','▄','▅','▆','▇','█'), "
        "CAST(ceil(element_at(m, i) * 8.0 / mx) AS INT)) END), '')"
    )
    return agg.select("event_type", chars.alias("spark_hours"))


@query(
    "sql_ch_dialect_vocab_r6c",
    oracle=r"""
SELECT o_orderkey,
       CAST(list_max(list_filter(range(1, 98),
            d -> a % d = 0 AND b % d = 0)) AS BIGINT) AS g,
       CAST((a * b) // list_max(list_filter(range(1, 98),
            d -> a % d = 0 AND b % d = 0)) AS BIGINT) AS l,
       CAST(CASE WHEN n <= 1 THEN 1 ELSE list_product(list_transform(
            range(1, n + 1), x -> CAST(x AS BIGINT))) END AS BIGINT) AS fact,
       strftime(make_date(yy, mo, dd), '%Y-%m-%d') AS mkd,
       CAST(epoch(make_timestamp(yy, mo, dd, hh, mi, ss)) AS BIGINT) AS mkts,
       CAST(dayofyear(o_orderdate) AS INT) AS doy,
       (CASE WHEN (bs & 255) >= 128 THEN (bs & 255) - 256
             ELSE (bs & 255) END) * 72057594037927936
         + ((bs >> 8) & 255) * 281474976710656
         + ((bs >> 16) & 255) * 1099511627776
         + ((bs >> 24) & 255) * 4294967296 AS bsw,
       json_extract_string(js, '$.name') AS jss,
       CAST(json_array_length(jarr) AS INT) AS jal,
       list_sum(list_transform(range(1, 4),
            i -> abs(arr1[i] - arr2[i]))) AS l1,
       sqrt(list_sum(list_transform(range(1, 4),
            i -> (arr1[i] - arr2[i]) * (arr1[i] - arr2[i])))) AS l2d,
       CASE WHEN isnan(dbl) OR abs(dbl) = 'Infinity'::DOUBLE
            THEN -1.0 ELSE dbl END AS inf,
       'user:pw@sub.shop' || CAST(o_orderkey % 10 AS VARCHAR)
         || dom || ':8443' AS nl,
       CASE WHEN o_orderkey % 2 = 0 THEN 'example.co.uk'
            ELSE 'example.com' END AS cut,
       CAST(CASE WHEN a % 2 = 0 THEN a ELSE -1 END AS BIGINT) AS mfa
FROM (
  SELECT o_orderkey, o_orderdate,
         CAST(o_orderkey % 97 + 1 AS BIGINT) AS a,
         CAST(o_orderkey % 60 + 6 AS BIGINT) AS b,
         CAST(o_orderkey % 12 AS INT) AS n,
         CAST(1995 + o_orderkey % 25 AS INT) AS yy,
         CAST(o_orderkey % 12 + 1 AS INT) AS mo,
         CAST(o_orderkey % 28 + 1 AS INT) AS dd,
         CAST(o_orderkey % 24 AS INT) AS hh,
         CAST(o_orderkey % 60 AS INT) AS mi,
         CAST(o_orderkey % 59 AS INT) AS ss,
         CAST(o_orderkey % 100000000 AS BIGINT) AS bs,
         '{"name":"p' || CAST(o_orderkey % 50 AS VARCHAR) || '"}' AS js,
         '[1,2,' || CAST(o_orderkey % 9 AS VARCHAR) || ']' AS jarr,
         [CAST(o_orderkey % 5 + 1 AS DOUBLE), CAST(o_orderkey % 4 AS DOUBLE),
          CAST(o_orderkey % 3 AS DOUBLE)] AS arr1,
         [CAST(o_orderkey % 7 AS DOUBLE), CAST(o_orderkey % 6 AS DOUBLE),
          CAST(o_orderkey % 2 AS DOUBLE)] AS arr2,
         CASE WHEN o_orderkey % 3 = 0 THEN 'Infinity'::DOUBLE
              WHEN o_orderkey % 3 = 1 THEN 'NaN'::DOUBLE
              ELSE CAST(o_orderkey % 1000 AS DOUBLE) END AS dbl,
         CASE WHEN o_orderkey % 2 = 0 THEN '.example.co.uk'
              ELSE '.example.com' END AS dom
  FROM orders WHERE o_orderkey % 37 = 0
)
""",
)
def sql_ch_dialect_vocab_r6c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6c vocabulary widening, scalar half: gcd/lcm (Euclid inside a
    bounded aggregate fold — the ORACLE recomputes gcd by max-common-
    divisor filtering, an independent formulation), factorial, makeDate,
    makeDateTime, toDayOfYear, byteSwap (unsigned-shift byte reassembly;
    oracle replays with sign-adjusted multiplications), simpleJSONExtract-
    String, JSONArrayLength, L1Distance/L2Distance, ifNotFinite, netloc,
    cutToFirstSignificantSubdomain (documented public-suffix shortlist),
    mapFilter (CH lambda-first), element_at passthrough."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       gcd(a, b) AS g,
       lcm(a, b) AS l,
       factorial(n) AS fact,
       formatDateTime(makeDate(yy, mo, dd), '%F') AS mkd,
       toUnixTimestamp(makeDateTime(yy, mo, dd, hh, mi, ss)) AS mkts,
       toDayOfYear(o_orderdate) AS doy,
       byteSwap(bs) AS bsw,
       simpleJSONExtractString(js, 'name') AS jss,
       JSONArrayLength(jarr) AS jal,
       L1Distance(arr1, arr2) AS l1,
       L2Distance(arr1, arr2) AS l2d,
       ifNotFinite(dbl, -1.0) AS inf,
       netloc(url) AS nl,
       cutToFirstSignificantSubdomain(url) AS cut,
       coalesce(element_at(mapFilter((k, v) -> v % 2 = 0,
           map('a', a, 'b', b)), 'a'), CAST(-1 AS BIGINT)) AS mfa
FROM (
  SELECT o_orderkey, o_orderdate,
         CAST(o_orderkey % 97 + 1 AS BIGINT) AS a,
         CAST(o_orderkey % 60 + 6 AS BIGINT) AS b,
         CAST(o_orderkey % 12 AS INT) AS n,
         CAST(1995 + o_orderkey % 25 AS INT) AS yy,
         CAST(o_orderkey % 12 + 1 AS INT) AS mo,
         CAST(o_orderkey % 28 + 1 AS INT) AS dd,
         CAST(o_orderkey % 24 AS INT) AS hh,
         CAST(o_orderkey % 60 AS INT) AS mi,
         CAST(o_orderkey % 59 AS INT) AS ss,
         CAST(o_orderkey % 100000000 AS BIGINT) AS bs,
         concat('{"name":"p', toString(o_orderkey % 50), '"}') AS js,
         concat('[1,2,', toString(o_orderkey % 9), ']') AS jarr,
         array(CAST(o_orderkey % 5 + 1 AS DOUBLE),
               CAST(o_orderkey % 4 AS DOUBLE),
               CAST(o_orderkey % 3 AS DOUBLE)) AS arr1,
         array(CAST(o_orderkey % 7 AS DOUBLE),
               CAST(o_orderkey % 6 AS DOUBLE),
               CAST(o_orderkey % 2 AS DOUBLE)) AS arr2,
         CASE WHEN o_orderkey % 3 = 0 THEN double('Infinity')
              WHEN o_orderkey % 3 = 1 THEN double('NaN')
              ELSE CAST(o_orderkey % 1000 AS DOUBLE) END AS dbl,
         concat('https://user:pw@sub.shop', toString(o_orderkey % 10),
                CASE WHEN o_orderkey % 2 = 0 THEN '.example.co.uk'
                     ELSE '.example.com' END, ':8443/path?q=1') AS url
  FROM orders WHERE o_orderkey % 37 = 0
)
"""
    out = spark.sql(translate_ch_sql(ch_sql))
    return out.withColumn("doy", F.col("doy").cast("int")).withColumn(
        "jal", F.col("jal").cast("int")
    )


@query(
    "sql_ch_dialect_vocab_r6c_agg",
    oracle="""
SELECT o_orderpriority,
       (CAST(SUM(x * y) AS BIGINT)
          - CAST(SUM(x) AS BIGINT) * CAST(SUM(y) AS BIGINT)
            / CAST(COUNT(x) AS BIGINT))
         / (CAST(COUNT(x) AS BIGINT) - 1) AS cov,
       (CAST(MAX(y2) AS DOUBLE) - MIN(y2))
         / (CAST(MAX(x2) AS DOUBLE) - MIN(x2)) AS br,
       CAST(CAST(COUNT(x) AS BIGINT) * CAST(SUM(x * y) AS BIGINT)
            - CAST(SUM(x) AS BIGINT) * CAST(SUM(y) AS BIGINT) AS DOUBLE)
         / (CAST(COUNT(x) AS BIGINT) * CAST(SUM(x * x) AS BIGINT)
            - CAST(SUM(x) AS BIGINT) * CAST(SUM(x) AS BIGINT)) AS slr_k,
       (CAST(SUM(y) AS BIGINT)
          - (CAST(CAST(COUNT(x) AS BIGINT) * CAST(SUM(x * y) AS BIGINT)
              - CAST(SUM(x) AS BIGINT) * CAST(SUM(y) AS BIGINT) AS DOUBLE)
             / (CAST(COUNT(x) AS BIGINT) * CAST(SUM(x * x) AS BIGINT)
                - CAST(SUM(x) AS BIGINT) * CAST(SUM(x) AS BIGINT)))
            * CAST(SUM(x) AS BIGINT))
         / CAST(COUNT(x) AS BIGINT) AS slr_b,
       '[' || CAST(MAX(CASE WHEN x < 50 THEN 1 ELSE 0 END) AS VARCHAR)
         || ',' || CAST(LEAST(MAX(CASE WHEN x < 50 THEN 1 ELSE 0 END),
                MAX(CASE WHEN x < 20 THEN 1 ELSE 0 END)) AS VARCHAR)
         || ',' || CAST(LEAST(MAX(CASE WHEN x < 50 THEN 1 ELSE 0 END),
                MAX(CASE WHEN x < 80 THEN 1 ELSE 0 END)) AS VARCHAR)
         || ']' AS ret,
       CAST(SUM(x) AS BIGINT) AS sk,
       CAST(SUM(x) AS BIGINT) AS sc_s,
       CAST(COUNT(x) AS BIGINT) AS sc_c
FROM (
  SELECT o_orderpriority,
         CAST(o_orderkey % 100 AS BIGINT) AS x,
         CAST((o_orderkey % 100) * 3 + o_orderkey % 7 AS BIGINT) AS y,
         CAST(o_orderkey % 977 AS BIGINT) AS x2,
         CAST(o_orderkey % 641 AS BIGINT) AS y2
  FROM orders WHERE o_orderkey % 11 = 0
)
GROUP BY o_orderpriority
""",
)
def sql_ch_dialect_vocab_r6c_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6c vocabulary widening, aggregate half: covarSamp,
    boundingRatio, simpleLinearRegression (tuple surfaced via
    tupleElement), retention (3-condition ladder, canon-serialized),
    sumKahan (documented no-op: sums here are already exact), sumCount.
    Every float output is a +,-,*,/ chain over exact integer power sums —
    correctly-rounded IEEE ops, so both engines agree bit-for-bit."""
    from moosestack_spark.registry import canon_arrays
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderpriority,
       covarSamp(x, y) AS cov,
       boundingRatio(x2, y2) AS br,
       tupleElement(simpleLinearRegression(x, y), 1) AS slr_k,
       tupleElement(simpleLinearRegression(x, y), 2) AS slr_b,
       retention(x < 50, x < 20, x < 80) AS ret,
       sumKahan(x) AS sk,
       tupleElement(sumCount(x), 1) AS sc_s,
       tupleElement(sumCount(x), 2) AS sc_c
FROM (
  SELECT o_orderpriority,
         CAST(o_orderkey % 100 AS BIGINT) AS x,
         CAST((o_orderkey % 100) * 3 + o_orderkey % 7 AS BIGINT) AS y,
         CAST(o_orderkey % 977 AS BIGINT) AS x2,
         CAST(o_orderkey % 641 AS BIGINT) AS y2
  FROM orders WHERE o_orderkey % 11 = 0
)
GROUP BY o_orderpriority
"""
    return canon_arrays(spark.sql(translate_ch_sql(ch_sql)), "ret")


@query(
    "sql_ch_dialect_numbers",
    oracle="""
SELECT n1.number AS a, n2.number AS b,
       CAST(n1.number * n2.number AS BIGINT) AS prod
FROM (SELECT i AS number FROM UNNEST(range(0, 8)) AS t(i)) n1
JOIN (SELECT i AS number FROM UNNEST(range(100, 104)) AS u(i)) n2
  ON n1.number % 4 = n2.number % 4
ORDER BY a, b
""",
)
def sql_ch_dialect_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH numbers(N) / numbers(offset, N) table functions end-to-end
    through the translator (rewritten to Spark's range() TVF with the
    column renamed to CH's `number`), joined and ordered."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql

    ch_sql = """
SELECT n1.number AS a, n2.number AS b,
       CAST(n1.number * n2.number AS BIGINT) AS prod
FROM numbers(8) n1
JOIN numbers(100, 4) n2 ON n1.number % 4 = n2.number % 4
ORDER BY a, b
"""
    return spark.sql(translate_ch_sql(ch_sql))


@query(
    "sql_ch_dialect_vocab_r6d",
    oracle=r"""
SELECT o_orderkey,
       '[' || array_to_string(list_transform(arr,
           x -> CAST(len(list_distinct(arr[1 : list_position(arr, x)]))
                AS VARCHAR)), ',') || ']' AS aed,
       '[' || array_to_string(list_transform(range(1, len(arr) + 1),
           i -> CAST(COALESCE(list_filter(arr[1:i], y -> y % 2 = 0)[-1],
                              arr[i]) AS VARCHAR)), ',') || ']' AS afl,
       '[' || array_to_string(list_transform(range(1, len(arr) + 1),
           i -> CAST(COALESCE(list_filter(arr[i:], y -> y % 2 = 0)[1],
                              arr[i]) AS VARCHAR)), ',') || ']' AS arf,
       CAST((a >> 1) & (a >> 3) & 1 AS BIGINT) AS bta,
       CAST(((a >> 1) | (a >> 3)) & 1 AS BIGINT) AS bto,
       array_to_string((string_split(host, '.'))[1:2], '.') AS si2,
       array_to_string((string_split(host, '.'))[-1:], '.') AS sim1,
       CAST(len(regexp_extract_all(txt, '[0-9]+')) AS BIGINT) AS cm,
       lg AS lgf, ld AS ldf
FROM (
  SELECT o_orderkey,
         [CAST(o_orderkey % 5 AS BIGINT), CAST(o_orderkey % 3 AS BIGINT),
          CAST(o_orderkey % 5 AS BIGINT), CAST(o_orderkey % 7 AS BIGINT)]
           AS arr,
         CAST(o_orderkey % 16 AS BIGINT) AS a,
         'shop' || CAST(o_orderkey % 9 AS VARCHAR) || '.example.com' AS host,
         'a' || CAST(o_orderkey % 10 AS VARCHAR) || ' b'
           || CAST(o_orderkey % 7 AS VARCHAR) AS txt,
         lag(o_orderkey) OVER (PARTITION BY o_orderkey % 4
                               ORDER BY o_orderkey) AS lg,
         lead(o_orderkey) OVER (PARTITION BY o_orderkey % 4
                                ORDER BY o_orderkey) AS ld
  FROM orders WHERE o_orderkey % 29 = 0
)
""",
)
def sql_ch_dialect_vocab_r6d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6d vocabulary: arrayEnumerateDense (first-occurrence dense
    ranks), arrayFill/arrayReverseFill (lambda spliced into a slice
    filter — CH lambda-first order), bitTestAll/bitTestAny (two-index
    form), substringIndex (negative counts too), countMatches,
    lagInFrame/leadInFrame renames inside real OVER frames."""
    from moosestack_spark.registry import canon_arrays
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       arrayEnumerateDense(arr) AS aed,
       arrayFill(x -> x % 2 = 0, arr) AS afl,
       arrayReverseFill(x -> x % 2 = 0, arr) AS arf,
       bitTestAll(a, 1, 3) AS bta,
       bitTestAny(a, 1, 3) AS bto,
       substringIndex(host, '.', 2) AS si2,
       substringIndex(host, '.', -1) AS sim1,
       countMatches(txt, '[0-9]+') AS cm,
       lagInFrame(o_orderkey) OVER (PARTITION BY o_orderkey % 4
                                    ORDER BY o_orderkey) AS lgf,
       leadInFrame(o_orderkey) OVER (PARTITION BY o_orderkey % 4
                                     ORDER BY o_orderkey) AS ldf
FROM (
  SELECT o_orderkey,
         array(CAST(o_orderkey % 5 AS BIGINT), CAST(o_orderkey % 3 AS BIGINT),
               CAST(o_orderkey % 5 AS BIGINT), CAST(o_orderkey % 7 AS BIGINT))
           AS arr,
         CAST(o_orderkey % 16 AS BIGINT) AS a,
         concat('shop', toString(o_orderkey % 9), '.example.com') AS host,
         concat('a', toString(o_orderkey % 10), ' b',
                toString(o_orderkey % 7)) AS txt
  FROM orders WHERE o_orderkey % 29 = 0
)
"""
    out = spark.sql(translate_ch_sql(ch_sql))
    return canon_arrays(out, "aed", "afl", "arf")
