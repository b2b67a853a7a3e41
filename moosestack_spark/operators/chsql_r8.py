"""Round-8 ClickHouse dialect vocabulary gate (SURVEY.md §2.9).

One gate exercising the round-8 translator additions end-to-end through
``translate_ch_sql`` on a generated-from-orderkey fixture with a
closed-form DuckDB replay:

- vector family: L2SquaredDistance, LinfDistance, L2Normalize;
- string family: splitByNonAlpha, hasSubsequence (matched-prefix fold),
  translateUTF8, ascii, rightPadUTF8, regexpQuoteMeta, toDecimalString;
- datetime family: addMilliseconds, subtractMilliseconds,
  toUnixTimestamp64Nano, toYYYYMMDDhhmmss;
- URL family: firstSignificantSubdomain (same documented public-suffix
  shortlist as cutToFirstSignificantSubdomain).

All expressions stay JVM-side (templates compile to built-in Spark SQL);
the gate prunes to a ~1/31 orderkey sample so the dialect surface stays a
cheap smoke at any SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)

from moosestack_spark.registry import canon_arrays, query


@query(
    "sql_ch_dialect_vocab_r8",
    oracle=r"""
WITH p AS (
  SELECT o_orderkey,
         o_orderkey % 2 AS k2, o_orderkey % 3 AS k3, o_orderkey % 4 AS k4,
         o_orderkey % 5 AS k5, o_orderkey % 6 AS k6, o_orderkey % 9 AS k9,
         o_orderkey % 10 AS k10,
         TIMESTAMP '2022-01-01 00:00:00' + to_seconds(o_orderkey) AS ts
  FROM orders WHERE o_orderkey % 31 = 0
), q AS (
  SELECT *,
         substring('alphabetagamma', 1 + k4, 5) || CAST(k10 AS VARCHAR)
           || 'tail' AS txt,
         CAST(1 + k5 AS DOUBLE) AS a1, CAST(2 + k3 AS DOUBLE) AS a2,
         CAST(k4 AS DOUBLE) AS b1, CAST(1 + k6 AS DOUBLE) AS b2
  FROM p
)
SELECT o_orderkey,
       array_to_string(list_filter(string_split_regex(txt, '[^A-Za-z]+'),
                                   __x -> __x != ''), '|') AS sna,
       CAST((a1 - b1) * (a1 - b1) + (a2 - b2) * (a2 - b2) AS BIGINT) AS l2s,
       CAST(GREATEST(ABS(a1 - b1), ABS(a2 - b2)) AS BIGINT) AS linf,
       '[' || CAST(CAST(round(a1 / SQRT(a1 * a1 + a2 * a2) * 1000000)
                   AS BIGINT) AS VARCHAR)
           || ',' ||
           CAST(CAST(round(a2 / SQRT(a1 * a1 + a2 * a2) * 1000000)
                   AS BIGINT) AS VARCHAR) || ']' AS l2n,
       regexp_matches(txt, 'a.*p.*t') AS hsub,
       translate(txt, 'at', 'xy') AS tr,
       ascii(substring(txt, 1, 1)) AS asc1,
       rpad(CAST(k5 AS VARCHAR), 6, '*') AS rp,
       regexp_replace('a.' || CAST(k3 AS VARCHAR) || '*',
                      '([\.^$|?*+()\[\]{}\\])', '\\\1', 'g') AS rqm,
       epoch_ms(ts + to_milliseconds(1500 + o_orderkey % 997)) AS addms,
       epoch_ms(ts - to_milliseconds(250)) AS subms,
       epoch_ns(ts) AS ns,
       CAST(strftime(ts, '%Y%m%d%H%M%S') AS BIGINT) AS ymdhms,
       CAST(CAST(o_orderkey / 7 AS DECIMAL(38, 3)) AS VARCHAR) AS decs,
       'shop' || CAST(k9 AS VARCHAR) AS fss
FROM q
""",
)
def sql_ch_dialect_vocab_r8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 vocabulary batch: vector distances + normalize, non-alpha
    split, subsequence fold, translate/pad/quote-meta string ops,
    millisecond arithmetic, nano epoch, compact datetime int, decimal
    formatting, significant subdomain."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       arrayStringConcat(splitByNonAlpha(txt), '|') AS sna,
       toInt64(L2SquaredDistance(va, vb)) AS l2s,
       toInt64(LinfDistance(va, vb)) AS linf,
       arrayMap(x -> toInt64(round(x * 1000000)), L2Normalize(va)) AS l2n,
       hasSubsequence(txt, 'apt') AS hsub,
       translateUTF8(txt, 'at', 'xy') AS tr,
       ascii(substring(txt, 1, 1)) AS asc1,
       rightPadUTF8(toString(o_orderkey % 5), 6, '*') AS rp,
       regexpQuoteMeta(concat('a.', toString(o_orderkey % 3), '*')) AS rqm,
       toUnixTimestamp64Milli(
         addMilliseconds(ts, 1500 + o_orderkey % 997)) AS addms,
       toUnixTimestamp64Milli(subtractMilliseconds(ts, 250)) AS subms,
       toUnixTimestamp64Nano(ts) AS ns,
       toYYYYMMDDhhmmss(ts) AS ymdhms,
       toDecimalString(o_orderkey / 7, 3) AS decs,
       firstSignificantSubdomain(url) AS fss
FROM (
  SELECT o_orderkey,
         concat(substring('alphabetagamma', 1 + (o_orderkey % 4), 5),
                toString(o_orderkey % 10), 'tail') AS txt,
         array(toFloat64(1 + o_orderkey % 5),
               toFloat64(2 + o_orderkey % 3)) AS va,
         array(toFloat64(o_orderkey % 4),
               toFloat64(1 + o_orderkey % 6)) AS vb,
         concat('https://sub', toString(o_orderkey % 9), '.shop',
                toString(o_orderkey % 9), '.co.uk/x') AS url,
         toDateTime(1640995200 + o_orderkey) AS ts
  FROM orders WHERE o_orderkey % 31 = 0
)
"""
    out = spark.sql(translate_ch_sql(ch_sql))
    return canon_arrays(out, "l2n")


@query(
    "sql_ch_dialect_vocab_r8b",
    oracle="""
SELECT o_orderpriority,
       (CAST(SUM(x * y) AS BIGINT)
          - CAST(SUM(x) AS BIGINT) * CAST(SUM(y) AS BIGINT)
            / CAST(COUNT(x) AS BIGINT))
         / CAST(COUNT(x) AS BIGINT) AS cvp,
       CAST(SUM(x * w) AS BIGINT) / CAST(SUM(w) AS BIGINT) AS aw,
       CAST(BIT_AND(m) AS BIGINT) AS ba,
       CAST(BIT_OR(m) AS BIGINT) AS bo,
       CAST(BIT_XOR(m) AS BIGINT) AS bx
FROM (
  SELECT o_orderpriority,
         CAST(o_orderkey % 100 AS BIGINT) AS x,
         CAST((o_orderkey % 100) * 3 + o_orderkey % 7 AS BIGINT) AS y,
         CAST(1 + o_orderkey % 9 AS BIGINT) AS w,
         CAST(o_orderkey % 256 AS BIGINT) AS m
  FROM orders WHERE o_orderkey % 11 = 0
)
GROUP BY o_orderpriority
""",
)
def sql_ch_dialect_vocab_r8b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 vocabulary, aggregate half: covarPop (power-sum spelling),
    avgWeighted, groupBitAnd/Or/Xor.  Float outputs are correctly-rounded
    chains over exact integer power sums (the r6c_agg discipline), so both
    engines agree bit-for-bit."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderpriority,
       covarPop(x, y) AS cvp,
       avgWeighted(x, w) AS aw,
       groupBitAnd(m) AS ba,
       groupBitOr(m) AS bo,
       groupBitXor(m) AS bx
FROM (
  SELECT o_orderpriority,
         CAST(o_orderkey % 100 AS BIGINT) AS x,
         CAST((o_orderkey % 100) * 3 + o_orderkey % 7 AS BIGINT) AS y,
         CAST(1 + o_orderkey % 9 AS BIGINT) AS w,
         CAST(o_orderkey % 256 AS BIGINT) AS m
  FROM orders WHERE o_orderkey % 11 = 0
)
GROUP BY o_orderpriority
"""
    return spark.sql(translate_ch_sql(ch_sql))


@query(
    "sql_ch_dialect_vocab_r8c",
    oracle="""
SELECT o_orderkey,
       CAST(trunc(v) AS BIGINT) AS tr,
       round_even(CAST((o_orderkey % 100) + 0.5 AS DOUBLE), 0) AS rb,
       round_even(v, 2) AS rb2,
       CAST((o_orderkey % 10000) // 3600 AS BIGINT) AS td_h,
       CAST((o_orderkey % 10000) // 60 AS BIGINT) AS td_m,
       CAST((1640995200 + o_orderkey % 10000) AS BIGINT) * 1000000 AS micro
FROM (
  SELECT o_orderkey,
         CAST((o_orderkey % 100) - 50 AS DOUBLE) / 7 AS v
  FROM orders WHERE o_orderkey % 37 = 0
)
""",
)
def sql_ch_dialect_vocab_r8c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 batch c: trunc (toward zero), roundBankers (HALF_EVEN =
    Spark bround vs DuckDB round_even), timestampDiff (complete-unit
    counting, the documented dateDiff semantics), toStartOfMicrosecond
    (identity at Spark's microsecond timestamp precision)."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       trunc(v) AS tr,
       roundBankers(toFloat64((o_orderkey % 100) + 0.5), 0) AS rb,
       roundBankers(v, 2) AS rb2,
       timestampDiff('hour', ts0, ts1) AS td_h,
       timestampDiff('minute', ts0, ts1) AS td_m,
       toUnixTimestamp64Micro(toStartOfMicrosecond(ts1)) AS micro
FROM (
  SELECT o_orderkey,
         ((o_orderkey % 100) - 50) / 7 AS v,
         toDateTime(1640995200) AS ts0,
         toDateTime(1640995200 + (o_orderkey % 10000)) AS ts1
  FROM orders WHERE o_orderkey % 37 = 0
)
"""
    return spark.sql(translate_ch_sql(ch_sql))
