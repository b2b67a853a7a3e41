"""Round-9 ClickHouse dialect vocabulary gates (SURVEY.md §2.9).

Two gates exercising the round-9 translator additions end-to-end through
``translate_ch_sql`` on generated-from-orderkey fixtures with closed-form
DuckDB replays:

- scalar half: toRelativeMinuteNum/HourNum/DayNum (epoch bucket numbers),
  isValidJSON (variant try-parse; valid and broken payloads both
  asserted), normalizeQuery (literal masking with identifier
  preservation — the regex is lookbehind-free so the SAME pattern runs
  under RE2 in the oracle);
- aggregate half: skewSamp/kurtSamp (unbiased sample moments over exact
  integer power sums — the Spark template and the oracle share ONE
  expression builder, sql/stats_moments.py, so the double chains are
  textually identical) and deltaSumTimestamp (timestamp-ordered
  positive-delta sum; the insertion-order-dependent deltaSum is a loud
  REFUSAL pointing here, pinned in tests/test_ch_parity_sweep.py),
  plus quantileExactWeighted (exact integer-weighted quantile via a
  bound-struct fold — aggregates stay outside the lambda) and
  extractAllGroupsVertical in the scalar half (translate-time capture
  arity over literal patterns).  boundingRatio/sumKahan keep their
  round-6 definitions (r6c_agg).

All expressions stay JVM-side; both gates prune to a sparse orderkey
sample so the dialect surface stays a cheap smoke at any SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from moosestack_spark.registry import query
from moosestack_spark.sql import stats_moments as _sm


@query(
    "sql_ch_dialect_vocab_r9",
    oracle=r"""
SELECT o_orderkey,
       CAST(FLOOR(CAST(epoch(ts) AS DOUBLE) / 60) AS BIGINT) AS rmin,
       CAST(FLOOR(CAST(epoch(ts) AS DOUBLE) / 3600) AS BIGINT) AS rhour,
       CAST(FLOOR(CAST(epoch(ts) AS DOUBLE) / 86400) AS BIGINT) AS rday,
       json_valid(js) AS vj,
       json_valid(bad) AS vjb,
       regexp_replace(regexp_replace(q, '''[^'']*''', '?', 'g'),
                      '(^|[^A-Za-z_0-9])[0-9]+(\.[0-9]+)?', '\1?',
                      'g') AS nq,
       array_to_string(
         list_transform(
           list_zip(regexp_extract_all(kv, '([a-z])=([0-9]+)', 1),
                    regexp_extract_all(kv, '([a-z])=([0-9]+)', 2)),
           s -> s[1] || ':' || s[2]), '|') AS eag
FROM (
  SELECT o_orderkey,
         TIMESTAMP '2022-01-01 00:00:00'
           + to_seconds(o_orderkey * 37 % 40000000) AS ts,
         'x=' || CAST(o_orderkey % 9 AS VARCHAR)
           || ';y=' || CAST(o_orderkey % 77 AS VARCHAR)
           || ';z=' || CAST(o_orderkey % 500 AS VARCHAR) AS kv,
         '{"a":' || CAST(o_orderkey % 50 AS VARCHAR) || '}' AS js,
         '{oops' || CAST(o_orderkey % 3 AS VARCHAR) AS bad,
         'SELECT col' || CAST(o_orderkey % 7 AS VARCHAR)
           || ' FROM t WHERE a = ' || CAST(o_orderkey % 100 AS VARCHAR)
           || ' AND s = ''v' || CAST(o_orderkey % 5 AS VARCHAR)
           || ''' AND b IN (1, 2.5)' AS q
  FROM orders WHERE o_orderkey % 31 = 0
)
""",
)
def sql_ch_dialect_vocab_r9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 scalar vocabulary through the dialect translator."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       toRelativeMinuteNum(ts) AS rmin,
       toRelativeHourNum(ts) AS rhour,
       toRelativeDayNum(ts) AS rday,
       isValidJSON(js) AS vj,
       isValidJSON(bad) AS vjb,
       normalizeQuery(q) AS nq,
       arrayStringConcat(
         arrayMap(g -> arrayStringConcat(g, ':'),
                  extractAllGroupsVertical(kv, '([a-z])=([0-9]+)')),
         '|') AS eag
FROM (
  SELECT o_orderkey,
         toDateTime(1640995200 + o_orderkey * 37 % 40000000) AS ts,
         concat('x=', toString(o_orderkey % 9),
                ';y=', toString(o_orderkey % 77),
                ';z=', toString(o_orderkey % 500)) AS kv,
         concat('{"a":', toString(o_orderkey % 50), '}') AS js,
         concat('{oops', toString(o_orderkey % 3)) AS bad,
         concat('SELECT col', toString(o_orderkey % 7),
                ' FROM t WHERE a = ', toString(o_orderkey % 100),
                ' AND s = ''v', toString(o_orderkey % 5),
                ''' AND b IN (1, 2.5)') AS q
  FROM orders WHERE o_orderkey % 31 = 0
)
"""
    return spark.sql(translate_ch_sql(ch_sql))


_SK = _sm.skew_samp_sql("x")
_KU = _sm.kurt_samp_sql("x")

@query(
    "sql_ch_dialect_vocab_r9b",
    oracle=f"""
WITH base AS (
  SELECT o_orderpriority,
         CAST(o_orderkey % 97 AS BIGINT)
           + CAST((o_orderkey % 13) * (o_orderkey % 7) AS BIGINT) AS x,
         CAST(o_orderkey AS BIGINT) AS t,
         CAST((o_orderkey * 7919) % 1000 AS BIGINT) AS v,
         CAST(1 + o_orderkey % 9 AS BIGINT) AS w
  FROM orders WHERE o_orderkey % 11 = 0
), dst AS (
  SELECT o_orderpriority,
         CAST(SUM(CASE WHEN dv > 0 THEN dv ELSE 0 END) AS BIGINT) AS dst
  FROM (
    SELECT o_orderpriority,
           v - LAG(v) OVER (PARTITION BY o_orderpriority ORDER BY t) AS dv
    FROM base
  ) GROUP BY o_orderpriority
), agg AS (
  SELECT o_orderpriority,
         CAST(ROUND({_SK} * 1000000) AS BIGINT) AS sk,
         CAST(ROUND({_KU} * 1000000) AS BIGINT) AS ku,
         CAST(SUM(x) AS BIGINT) AS sx
  FROM base GROUP BY o_orderpriority
), qw AS (
  SELECT o_orderpriority,
         MIN(CASE WHEN cw >= t THEN xd END) AS qw
  FROM (
    SELECT o_orderpriority, CAST(x AS DOUBLE) AS xd,
           SUM(w) OVER (PARTITION BY o_orderpriority ORDER BY x, w
                        ROWS UNBOUNDED PRECEDING) AS cw,
           CAST(CEIL(0.5 * SUM(w) OVER (PARTITION BY o_orderpriority))
                AS BIGINT) AS t
    FROM base
  ) GROUP BY o_orderpriority
)
SELECT agg.o_orderpriority, sk, ku, sx, dst, qw
FROM agg JOIN dst USING (o_orderpriority) JOIN qw USING (o_orderpriority)
""",
)
def sql_ch_dialect_vocab_r9b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 aggregate vocabulary through the dialect translator."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderpriority,
       toInt64(round(skewSamp(x) * 1000000)) AS sk,
       toInt64(round(kurtSamp(x) * 1000000)) AS ku,
       toInt64(sum(x)) AS sx,
       deltaSumTimestamp(v, t) AS dst,
       quantileExactWeighted(0.5)(x, w) AS qw
FROM (
  SELECT o_orderpriority,
         toInt64(o_orderkey % 97) + toInt64((o_orderkey % 13) * (o_orderkey % 7)) AS x,
         toInt64(o_orderkey) AS t,
         toInt64((o_orderkey * 7919) % 1000) AS v,
         toInt64(1 + o_orderkey % 9) AS w
  FROM orders WHERE o_orderkey % 11 = 0
)
GROUP BY o_orderpriority
"""
    return spark.sql(translate_ch_sql(ch_sql))


@query(
    "sql_ch_dialect_vocab_r9c",
    oracle=r"""
SELECT o_orderkey,
       CAST(FLOOR(epoch_us(TIMESTAMP '2022-01-01 00:00:00'
                           + to_seconds(o_orderkey % 50)
                           + to_microseconds((o_orderkey * 977) % 1000000))
                  / 1000) AS BIGINT) AS dt64ms,
       '[' || array_to_string(list_transform(
           generate_series(lo, lo + 2), k -> CAST(k AS VARCHAR)), ',')
           || ']' AS mk,
       '[' || array_to_string(list_transform(generate_series(lo, lo + 2),
           k -> CAST(CASE WHEN k = lo THEN va
                          WHEN k = lo + 2 THEN vb ELSE 0 END AS VARCHAR)),
           ',') || ']' AS mv,
       regexp_matches(txt, '(^|[^0-9A-Za-z])tok($|[^0-9A-Za-z])') AS ht,
       regexp_matches(txt2, '(^|[^0-9A-Za-z])tok($|[^0-9A-Za-z])') AS ht2,
       'v' || CAST(o_orderkey % 50 AS VARCHAR) AS b64ok,
       '' AS b64bad
FROM (
  SELECT o_orderkey,
         CAST(o_orderkey % 5 + 1 AS BIGINT) AS lo,
         CAST(o_orderkey % 90 AS BIGINT) AS va,
         CAST(o_orderkey % 70 AS BIGINT) AS vb,
         'a tok-' || CAST(o_orderkey % 3 AS VARCHAR) AS txt,
         'atok ' || CAST(o_orderkey % 3 AS VARCHAR) AS txt2
  FROM orders WHERE o_orderkey % 31 = 0
)
""",
)
def sql_ch_dialect_vocab_r9c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 third vocabulary batch: toDateTime64 precision truncation
    (surfaced as epoch millis), mapPopulateSeries (dense-key fill,
    serialized via mapKeys/mapValues), hasToken (token-boundary literal
    search, needle regexp-quoted), tryBase64Decode ('' on undecodable
    input).  The map is built with mapFromArrays so population and
    serialization both run through the dialect."""
    from moosestack_spark.registry import canon_arrays
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       toUnixTimestamp64Milli(toDateTime64(ts_s, 3)) AS dt64ms,
       mapKeys(mapPopulateSeries(m)) AS mk,
       mapValues(mapPopulateSeries(m)) AS mv,
       hasToken(txt, 'tok') AS ht,
       hasToken(txt2, 'tok') AS ht2,
       tryBase64Decode(base64Encode(concat('v', toString(o_orderkey % 50)))) AS b64ok,
       tryBase64Decode(concat('!!', toString(o_orderkey % 7))) AS b64bad
FROM (
  SELECT o_orderkey,
         concat('2022-01-01 00:00:',
                leftPad(toString(o_orderkey % 50), 2, '0'),
                '.', leftPad(toString((o_orderkey * 977) % 1000000), 6, '0')
               ) AS ts_s,
         mapFromArrays(
           array(toInt64(o_orderkey % 5 + 1), toInt64(o_orderkey % 5 + 3)),
           array(toInt64(o_orderkey % 90), toInt64(o_orderkey % 70))) AS m,
         concat('a tok-', toString(o_orderkey % 3)) AS txt,
         concat('atok ', toString(o_orderkey % 3)) AS txt2
  FROM orders WHERE o_orderkey % 31 = 0
)
"""
    return canon_arrays(spark.sql(translate_ch_sql(ch_sql)), "mk", "mv")
