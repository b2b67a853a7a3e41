"""Round-7 ClickHouse dialect vocabulary gates (SURVEY.md §2.9).

Two gates exercising the round-7 translator additions end-to-end through
``translate_ch_sql`` on generated-from-orderkey fixtures, with closed-form
DuckDB replays (the generative integers make every expected value a modular
arithmetic expression — no DuckDB map/URL machinery needed):

- ``sql_ch_dialect_vocab_r7``: arrayFold, arrayShiftLeft/Right, mapUpdate,
  mapContainsKeyLike, mapExtractKeyLike, max2/min2, negate, sqrtOrNull,
  innerProduct, LpNorm, leftUTF8/rightUTF8/startsWithUTF8/endsWithUTF8,
  multiSearchFirstPosition, multiSearchAnyCaseInsensitive;
- ``sql_ch_dialect_vocab_r7b``: queryStringAndFragment,
  cutQueryStringAndFragment, cutWWW, URLHierarchy, URLPathHierarchy,
  extractURLParameters(+Names), isIPv6String, isIPAddressInRange,
  IPv4CIDRToRange, addQuarters/subtractQuarters, toRelativeQuarterNum,
  toRelativeWeekNum, snowflakeToDateTime/dateTimeToSnowflake, timeSlots.

All expressions stay JVM-side (templates compile to built-in Spark SQL);
the gates prune to a ~1/29 orderkey sample so the dialect surface stays a
cheap smoke at any SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)

from moosestack_spark.registry import canon_arrays, query


@query(
    "sql_ch_dialect_vocab_r7",
    oracle=r"""
SELECT o_orderkey,
       8 * a1 + 4 * a2 + 2 * a3 + a4 AS fold_sum,
       '[' || a2 || ',' || a3 || ',' || a4 || ',-1]' AS asl,
       '[-1,' || a1 || ',' || a2 || ',' || a3 || ']' AS asr,
       a3 AS mu_b,
       'a,b,c' AS mu_keys,
       TRUE AS mckl,
       'b' AS mekl,
       GREATEST(a1, a2) AS mx, LEAST(a1, a2) AS mn,
       -a1 AS ng,
       CASE WHEN a1 - 2 < 0 THEN NULL ELSE sqrt(a1 - 2) END AS sq,
       CAST(a1 * a2 + a2 * a4 AS DOUBLE) AS ip,
       CAST(pow(CAST(a1 * a1 * a1 + a2 * a2 * a2 AS DOUBLE),
                CAST(1.0 AS DOUBLE) / 3) AS FLOAT) AS lp3,
       substring(txt, 1, 3) AS lu,
       substring(txt, length(txt) - 1, 2) AS ru,
       txt LIKE 'a%' AS sw,
       CAST(a4 AS VARCHAR) = substring(txt, length(txt), 1) AS ew,
       CASE WHEN position('b' IN txt) > 0 AND position('9' IN txt) > 0
              THEN LEAST(position('b' IN txt), position('9' IN txt))
            WHEN position('b' IN txt) > 0 THEN position('b' IN txt)
            WHEN position('9' IN txt) > 0 THEN position('9' IN txt)
            ELSE 0 END AS msfp,
       position('b' IN txt) > 0 OR position('q' IN txt) > 0 AS msany
FROM (
  SELECT o_orderkey,
         CAST(o_orderkey % 5 AS BIGINT) AS a1,
         CAST(o_orderkey % 3 AS BIGINT) AS a2,
         CAST(o_orderkey % 5 AS BIGINT) AS a3,
         CAST(o_orderkey % 7 AS BIGINT) AS a4,
         'a' || CAST(o_orderkey % 10 AS VARCHAR) || ' b'
           || CAST(o_orderkey % 7 AS VARCHAR) AS txt
  FROM orders WHERE o_orderkey % 29 = 0
)
""",
)
def sql_ch_dialect_vocab_r7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7 vocabulary batch A: array folds/shifts, map update/filter
    helpers, two-arg max/min, guarded sqrt, vector norms, UTF8 aliases,
    multiSearch variants."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       arrayFold((acc, x) -> acc * 2 + x, arr, 0L) AS fold_sum,
       arrayShiftLeft(arr, 1, -1L) AS asl,
       arrayShiftRight(arr, 1, -1L) AS asr,
       arrayElement(mapUpdate(m1, m2), 'b') AS mu_b,
       arrayStringConcat(arraySort(mapKeys(mapUpdate(m1, m2))), ',')
         AS mu_keys,
       mapContainsKeyLike(m1, 'a%') AS mckl,
       arrayStringConcat(arraySort(mapKeys(
         mapExtractKeyLike(m1, '%b%'))), ',') AS mekl,
       max2(a1, a2) AS mx, min2(a1, a2) AS mn,
       negate(a1) AS ng,
       sqrtOrNull(a1 - 2) AS sq,
       innerProduct(va, vb) AS ip,
       toFloat32(LpNorm(va, 3)) AS lp3,
       leftUTF8(txt, 3) AS lu,
       rightUTF8(txt, 2) AS ru,
       startsWithUTF8(txt, 'a') AS sw,
       endsWithUTF8(txt, toString(a4)) AS ew,
       multiSearchFirstPosition(txt, array('b', '9')) AS msfp,
       multiSearchAnyCaseInsensitive(txt, array('B', 'q')) AS msany
FROM (
  SELECT o_orderkey,
         array(toInt64(o_orderkey % 5), toInt64(o_orderkey % 3),
               toInt64(o_orderkey % 5), toInt64(o_orderkey % 7)) AS arr,
         toInt64(o_orderkey % 5) AS a1,
         toInt64(o_orderkey % 3) AS a2,
         toInt64(o_orderkey % 7) AS a4,
         array(toFloat64(o_orderkey % 5), toFloat64(o_orderkey % 3)) AS va,
         array(toFloat64(o_orderkey % 3), toFloat64(o_orderkey % 7)) AS vb,
         map('a', toInt64(o_orderkey % 10), 'b', toInt64(o_orderkey % 7))
           AS m1,
         map('b', toInt64(o_orderkey % 5), 'c', 1L) AS m2,
         concat('a', toString(o_orderkey % 10), ' b',
                toString(o_orderkey % 7)) AS txt
  FROM orders WHERE o_orderkey % 29 = 0
)
"""
    out = spark.sql(translate_ch_sql(ch_sql))
    return canon_arrays(out, "asl", "asr")


@query(
    "sql_ch_dialect_vocab_r7b",
    oracle=r"""
SELECT o_orderkey,
       'x=1&y=' || k3 || '#f' || k2 AS qsf,
       'https://www.shop' || k9 || '.example.com/p' AS cqs,
       'https://shop' || k9 || '.example.com/cat' || k5 || '/item' || k7
         AS cw,
       '[https://www.shop' || k9 || '.example.com/,'
         || 'https://www.shop' || k9 || '.example.com/cat' || k5 || '/,'
         || 'https://www.shop' || k9 || '.example.com/cat' || k5
         || '/item' || k7 || ']' AS uh,
       '[/cat' || k5 || '/,/cat' || k5 || '/item' || k7 || ']' AS uph,
       '[x=1,y=' || k3 || ']' AS eup,
       '[x,y]' AS eupn,
       (k4 < 2) AS ip6,
       (k4 < 2) AS inr,
       '10.' || (k4 * 16) || '.4.0' AS cidr_lo,
       '10.' || (k4 * 16) || '.4.255' AS cidr_hi,
       strftime(CAST(d AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS aq,
       strftime(CAST(d AS DATE) - INTERVAL 6 MONTH, '%Y-%m-%d') AS sq2,
       CAST(year(d) * 4 + quarter(d) - 1 AS BIGINT) AS rqn,
       CAST(floor((date_diff('day', DATE '1970-01-01', CAST(d AS DATE)) + 4)
                  / 7) AS BIGINT) AS rwn,
       1288834974657 + o_orderkey AS sf_ms,
       (1640995200000 + o_orderkey * 1000 - 1288834974657) * 4194304
         AS dts,
       '[' || CAST(1640995200 + (o_orderkey % 2) * 1800 AS VARCHAR) || ','
           || CAST(1640997000 + (o_orderkey % 2) * 1800 AS VARCHAR) || ','
           || CAST(1640998800 + (o_orderkey % 2) * 1800 AS VARCHAR) || ']'
         AS tsl
FROM (
  SELECT o_orderkey, o_orderdate AS d,
         CAST(o_orderkey % 2 AS VARCHAR) AS k2,
         CAST(o_orderkey % 3 AS VARCHAR) AS k3,
         CAST(o_orderkey % 4 AS BIGINT) AS k4,
         CAST(o_orderkey % 5 AS VARCHAR) AS k5,
         CAST(o_orderkey % 7 AS VARCHAR) AS k7,
         CAST(o_orderkey % 9 AS VARCHAR) AS k9
  FROM orders WHERE o_orderkey % 29 = 0
)
""",
)
def sql_ch_dialect_vocab_r7b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7 vocabulary batch B: URL cut/hierarchy/parameter family,
    IPv6/CIDR predicates, quarter/week arithmetic, snowflake ids,
    timeSlots."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       queryStringAndFragment(url2) AS qsf,
       cutQueryStringAndFragment(url2) AS cqs,
       cutWWW(url) AS cw,
       URLHierarchy(url) AS uh,
       URLPathHierarchy(url) AS uph,
       extractURLParameters(url2) AS eup,
       extractURLParameterNames(url2) AS eupn,
       isIPv6String(CASE WHEN k4 = 0 THEN '::1'
                         WHEN k4 = 1 THEN '2001:db8::1'
                         WHEN k4 = 2 THEN '1:2:3:4:5:6:7:8:9::'
                         ELSE '10.0.0.1' END) AS ip6,
       isIPAddressInRange(ip, '10.0.0.0/11') AS inr,
       IPv4CIDRToRange(ip, 24) AS cidr,
       toString(addQuarters(toDate(d), 1)) AS aq,
       toString(subtractQuarters(toDate(d), 2)) AS sq2,
       toInt64(toRelativeQuarterNum(d)) AS rqn,
       toRelativeWeekNum(toDate(d)) AS rwn,
       toUnixTimestamp64Milli(snowflakeToDateTime(
         o_orderkey * 4194304 + 123456)) AS sf_ms,
       dateTimeToSnowflake(ts) AS dts,
       arrayMap(t -> toUnixTimestamp(t), timeSlots(ts0, 3600, 1800)) AS tsl
FROM (
  SELECT o_orderkey, o_orderdate AS d,
         o_orderkey % 2 AS k2,
         o_orderkey % 4 AS k4,
         concat('https://www.shop', toString(o_orderkey % 9),
                '.example.com/cat', toString(o_orderkey % 5),
                '/item', toString(o_orderkey % 7)) AS url,
         concat('https://www.shop', toString(o_orderkey % 9),
                '.example.com/p?x=1&y=', toString(o_orderkey % 3),
                '#f', toString(o_orderkey % 2)) AS url2,
         concat('10.', toString((o_orderkey % 4) * 16), '.4.25') AS ip,
         toDateTime(1640995200 + o_orderkey) AS ts,
         toDateTime(1640995200 + (o_orderkey % 2) * 1800) AS ts0
  FROM orders WHERE o_orderkey % 29 = 0
)
"""
    out = spark.sql(translate_ch_sql(ch_sql))
    out = out.withColumn("cidr_lo", F.col("cidr.col1")).withColumn(
        "cidr_hi", F.col("cidr.col2")
    ).drop("cidr")
    return canon_arrays(out, "uh", "uph", "eup", "eupn", "tsl")


def _duck_morton(x: str, y: str) -> str:
    """DuckDB bit-interleave replay of the translator's 2D x 16-bit
    mortonEncode (same disjoint-bit sum)."""
    terms = []
    for i in range(16):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def _duck_frtd(secs: str) -> str:
    """DuckDB replay of formatReadableTimeDelta's day/hour/minute/second
    subset (concat_ws skips NULL components in both engines)."""
    def part(cnt: str, cond: str, unit: str) -> str:
        return (
            f"CASE WHEN {cnt} {cond} THEN CAST({cnt} AS VARCHAR) || ' {unit}' || "
            f"(CASE WHEN {cnt} = 1 THEN '' ELSE 's' END) END"
        )

    return (
        "concat_ws(', ', "
        + part(f"(({secs}) // 86400)", "> 0", "day")
        + ", "
        + part(f"((({secs}) // 3600) % 24)", "> 0", "hour")
        + ", "
        + part(f"((({secs}) // 60) % 60)", "> 0", "minute")
        + ", "
        + part(f"(({secs}) % 60)", f"> 0 OR ({secs}) = 0", "second")
        + ")"
    )


_R7C_ORACLE = f"""
SELECT o_orderkey,
       {_duck_frtd("secs")} AS frtd,
       bin(a1 * 37 + 5) AS bn,
       a1 * 37 + 5 AS ub,
       'a,b,c' AS msk,
       CAST(a5 AS VARCHAR) || ',' || CAST(a3 AS VARCHAR) || ',9' AS msv,
       datediff('day', DATE '1858-11-17', CAST(d AS DATE)) AS mjd,
       strftime(CAST(d AS DATE), '%Y-%m-%d') AS fmjd,
       strftime(CAST(d AS DATE) + INTERVAL 5 DAY, '%Y-%m-%d') AS ad,
       strftime(CAST(d AS DATE) - INTERVAL 3 DAY, '%Y-%m-%d') AS sd,
       CASE idx4 WHEN 0 THEN 'R163' WHEN 1 THEN 'A261'
                 WHEN 2 THEN 'T522' ELSE 'P236' END AS sx,
       repeat('ab', a3 + 1) AS rp,
       CAST(a5 AS BIGINT) AS spl,
       CASE k2 WHEN 0 THEN 0.5555555555555556
               ELSE 0.4666666666666667 END AS nd,
       {_duck_morton("mx", "my")} AS me,
       mx AS mdx, my AS mdy
FROM (
  SELECT o_orderkey,
         (o_orderkey % 5) * 23456 + (o_orderkey % 7) * 61 AS secs,
         CAST(o_orderkey % 5 AS BIGINT) AS a1,
         CAST(o_orderkey % 3 AS BIGINT) AS a3,
         CAST(o_orderkey % 4 AS BIGINT) AS idx4,
         CAST(o_orderkey % 6 AS BIGINT) AS a5,
         CAST(o_orderkey % 2 AS BIGINT) AS k2,
         CAST(o_orderkey % 1000 AS BIGINT) AS mx,
         CAST((o_orderkey * 7) % 1000 AS BIGINT) AS my,
         o_orderdate AS d
  FROM orders WHERE o_orderkey % 29 = 0
)
"""


@query("sql_ch_dialect_vocab_r7c", oracle=_R7C_ORACLE)
def sql_ch_dialect_vocab_r7c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7 vocabulary batch C: formatReadableTimeDelta (d/h/m/s
    subset), bin/unbin, mapSort, Modified-Julian-day pair, addDate/
    subDate, soundex, repeat/space, set-based ngramDistance, and the 2D
    morton encode/decode roundtrip."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       formatReadableTimeDelta(secs) AS frtd,
       bin(a1 * 37 + 5) AS bn,
       unbin(bin(a1 * 37 + 5)) AS ub,
       arrayStringConcat(mapKeys(mapSort(m)), ',') AS msk,
       arrayStringConcat(arrayMap(v -> toString(v),
                                  mapValues(mapSort(m))), ',') AS msv,
       toModifiedJulianDay(toDate(d)) AS mjd,
       toString(fromModifiedJulianDay(toModifiedJulianDay(toDate(d))))
         AS fmjd,
       toString(addDate(toDate(d), toIntervalDay(5))) AS ad,
       toString(subDate(toDate(d), toIntervalDay(3))) AS sd,
       soundex(arrayElement(
         array('Robert', 'Ashcraft', 'Tymczak', 'Pfister'), idx4 + 1)) AS sx,
       repeat('ab', a3 + 1) AS rp,
       toInt64(length(space(a5))) AS spl,
       ngramDistance(arrayElement(array('clickhouse', 'spark analytics'),
                                  k2 + 1),
                     arrayElement(array('clickhome', 'spark analysis'),
                                  k2 + 1)) AS nd,
       mortonEncode(mx, my) AS me,
       mortonDecode(2, mortonEncode(mx, my)).col1 AS mdx,
       mortonDecode(2, mortonEncode(mx, my)).col2 AS mdy
FROM (
  SELECT o_orderkey,
         (o_orderkey % 5) * 23456 + (o_orderkey % 7) * 61 AS secs,
         toInt64(o_orderkey % 5) AS a1,
         toInt64(o_orderkey % 3) AS a3,
         toInt32(o_orderkey % 4) AS idx4,
         toInt64(o_orderkey % 6) AS a5,
         toInt32(o_orderkey % 2) AS k2,
         toInt64(o_orderkey % 1000) AS mx,
         toInt64((o_orderkey * 7) % 1000) AS my,
         map('b', toInt64(o_orderkey % 3), 'a', toInt64(o_orderkey % 6),
             'c', 9L) AS m,
         o_orderdate AS d
  FROM orders WHERE o_orderkey % 29 = 0
)
"""
    return spark.sql(translate_ch_sql(ch_sql))


@query(
    "sql_ch_dialect_vocab_r7d",
    oracle="""
WITH base AS (
  SELECT o_orderkey,
         CAST(o_orderkey % 5 AS BIGINT) AS a1,
         CAST(o_orderkey % 3 AS BIGINT) AS a2,
         CAST(o_orderkey % 7 AS BIGINT) AS a3,
         CAST(o_orderkey % 7 AS VARCHAR) AS k7,
         CAST(o_orderkey % 5 AS VARCHAR) AS k5
  FROM orders WHERE o_orderkey % 29 = 0
), auc_ex AS (
  SELECT o_orderkey,
         UNNEST([CAST(a1 * 4 AS DOUBLE), CAST(a2 * 4 + 1 AS DOUBLE),
                 CAST(a1 * 4 + 2 AS DOUBLE), CAST(a3 * 4 + 3 AS DOUBLE)]) AS s,
         UNNEST([1, 0, 1, 0]) AS l
  FROM base
), auc_r AS (
  SELECT o_orderkey, l,
         ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY s) AS rk
  FROM auc_ex
), auc AS (
  SELECT o_orderkey,
         CAST(SUM(CASE WHEN l = 1 THEN rk ELSE 0 END) - 3 AS DOUBLE) / 4
           AS auc
  FROM auc_r GROUP BY o_orderkey
)
SELECT b.o_orderkey,
       '[' || b.a1 || ',' || GREATEST(b.a1 - b.a2, 0) || ','
           || (GREATEST(b.a1 - b.a2, 0) + b.a3) || ']' AS csnn,
       CASE WHEN b.a3 > 1 THEN b.a3 WHEN b.a1 > 1 THEN b.a1 END AS al,
       CASE WHEN b.a3 > 1 THEN 3 WHEN b.a1 > 1 THEN 1 ELSE 0 END AS ali,
       CASE WHEN b.k7 = b.k5 THEN 0 ELSE 1 END AS bh,
       2 AS bh2,
       auc.auc AS auc
FROM base b JOIN auc USING (o_orderkey)
""",
)
def sql_ch_dialect_vocab_r7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7 vocabulary batch D: arrayCumSumNonNegative (true running
    clamp via array-accumulator fold), lambda-first arrayLast/
    arrayLastIndex, byteHammingDistance (length-difference counting),
    tie-free arrayAUC.  The AUC oracle REPLAYS the rank arithmetic via
    unnest+window (scores use distinct mod-4 residues, so no ties at any
    SF); the rest are closed-form."""
    from moosestack_spark.sql.ch_functions import translate_ch_sql
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    ch_sql = """
SELECT o_orderkey,
       arrayCumSumNonNegative(array(a1, -a2, a3)) AS csnn,
       arrayLast(x -> x > 1, array(a1, -a2, a3)) AS al,
       arrayLastIndex(x -> x > 1, array(a1, -a2, a3)) AS ali,
       byteHammingDistance(concat('ab', toString(a3)),
                           concat('ab', toString(a1))) AS bh,
       byteHammingDistance('abc', 'abcde') AS bh2,
       arrayAUC(array(toFloat64(a1 * 4), toFloat64(a2 * 4 + 1),
                      toFloat64(a1 * 4 + 2), toFloat64(a3 * 4 + 3)),
                array(1, 0, 1, 0)) AS auc
FROM (
  SELECT o_orderkey,
         toInt64(o_orderkey % 5) AS a1,
         toInt64(o_orderkey % 3) AS a2,
         toInt64(o_orderkey % 7) AS a3
  FROM orders WHERE o_orderkey % 29 = 0
)
"""
    out = spark.sql(translate_ch_sql(ch_sql))
    return canon_arrays(out, "csnn")
