"""ClickHouse function vocabulary -> Spark (SURVEY.md §2.9).

The reference passes SQL through to ClickHouse verbatim; its templates and
examples establish the function vocabulary users rely on (citations:
templates/python-tests/src/views/bar_aggregated.py:16-24,
ts-moose-lib/src/query-layer/helpers.ts:100-104,
py-moose-lib/moose_lib/data_models.py:92-103,
templates/live-heartrate-leaderboard/app/apis/get_user_live_heart_rate_stats.py:70-84).

Two surfaces:

1. ``ch`` — a Python namespace of Column helpers (``ch.toStartOfMonth(c)``)
   compiling to built-in pyspark.sql.functions (JVM-side, codegen'd — never
   Python UDFs), for DataFrame-first users.
2. ``translate_ch_sql`` — a function-name rewriter for the SQL-string
   surface, covering the same vocabulary; unknown ClickHouse-only names fail
   loudly rather than silently producing wrong results.

Documented semantic differences from ClickHouse:
- cityHash64 -> xxhash64: different hash VALUES (same distribution use);
- uniq -> approx_count_distinct: different sketch, both approximate;
- toStartOfWeek: ClickHouse defaults to Sunday (mode 0); we emulate with
  date_trunc('week') shifted, matching mode 0.
"""

from __future__ import annotations

import re
from typing import Any, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _c(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


class _CH:
    """ClickHouse-named Column helpers (each maps to built-in Spark exprs)."""

    # ---- date/time -------------------------------------------------------
    @staticmethod
    def toDate(c: ColumnOrName) -> Column:
        return F.to_date(_c(c))

    @staticmethod
    def toDateTime(c: ColumnOrName) -> Column:
        return _c(c).cast("timestamp")

    @staticmethod
    def toStartOfDay(c: ColumnOrName) -> Column:
        return F.date_trunc("day", _c(c))

    @staticmethod
    def toStartOfHour(c: ColumnOrName) -> Column:
        return F.date_trunc("hour", _c(c))

    @staticmethod
    def toStartOfMinute(c: ColumnOrName) -> Column:
        return F.date_trunc("minute", _c(c))

    @staticmethod
    def toStartOfMonth(c: ColumnOrName) -> Column:
        return F.to_date(F.date_trunc("month", _c(c)))

    @staticmethod
    def toStartOfYear(c: ColumnOrName) -> Column:
        return F.to_date(F.date_trunc("year", _c(c)))

    @staticmethod
    def toStartOfWeek(c: ColumnOrName) -> Column:
        # CH mode 0 = week starts Sunday.  Spark date_trunc('week') starts
        # Monday, so shift by one day either side.
        return F.to_date(F.date_sub(F.date_trunc("week", F.date_add(_c(c), 1)), 1))

    @staticmethod
    def toStartOfFifteenMinutes(c: ColumnOrName) -> Column:
        # floor epoch seconds to 900s buckets, JVM-side arithmetic.
        secs = F.unix_timestamp(_c(c))
        return F.timestamp_seconds(secs - secs % 900)

    @staticmethod
    def toDayOfMonth(c: ColumnOrName) -> Column:
        return F.dayofmonth(_c(c))

    @staticmethod
    def toDayOfWeek(c: ColumnOrName) -> Column:
        # CH: Monday=1..Sunday=7; Spark dayofweek: Sunday=1..Saturday=7.
        return ((F.dayofweek(_c(c)) + 5) % 7) + 1

    @staticmethod
    def toHour(c: ColumnOrName) -> Column:
        return F.hour(_c(c))

    @staticmethod
    def toMinute(c: ColumnOrName) -> Column:
        return F.minute(_c(c))

    @staticmethod
    def toYear(c: ColumnOrName) -> Column:
        return F.year(_c(c))

    @staticmethod
    def toMonth(c: ColumnOrName) -> Column:
        return F.month(_c(c))

    @staticmethod
    def now() -> Column:
        return F.current_timestamp()

    @staticmethod
    def today() -> Column:
        return F.current_date()

    @staticmethod
    def dateDiff(unit: str, start: ColumnOrName, end: ColumnOrName) -> Column:
        unit = unit.strip("'\"").lower()
        s, e = _c(start), _c(end)
        if unit == "day":
            return F.datediff(F.to_date(e), F.to_date(s)).cast("long")
        if unit == "hour":
            return ((F.unix_timestamp(e) - F.unix_timestamp(s)) / 3600).cast("long")
        if unit == "minute":
            return ((F.unix_timestamp(e) - F.unix_timestamp(s)) / 60).cast("long")
        if unit == "second":
            return (F.unix_timestamp(e) - F.unix_timestamp(s)).cast("long")
        if unit == "month":
            return F.months_between(F.to_date(e), F.to_date(s)).cast("long")
        if unit == "year":
            return (F.year(e) - F.year(s)).cast("long")
        raise ValueError(f"dateDiff unit {unit!r} not supported")

    @staticmethod
    def addDays(c: ColumnOrName, n: int) -> Column:
        return F.date_add(_c(c), n)

    @staticmethod
    def subtractDays(c: ColumnOrName, n: int) -> Column:
        return F.date_sub(_c(c), n)

    # ---- conversions -----------------------------------------------------
    @staticmethod
    def toString(c: ColumnOrName) -> Column:
        return _c(c).cast("string")

    @staticmethod
    def toInt8(c: ColumnOrName) -> Column:
        return _c(c).cast("tinyint")

    @staticmethod
    def toInt16(c: ColumnOrName) -> Column:
        return _c(c).cast("smallint")

    @staticmethod
    def toInt32(c: ColumnOrName) -> Column:
        return _c(c).cast("int")

    @staticmethod
    def toInt64(c: ColumnOrName) -> Column:
        return _c(c).cast("bigint")

    @staticmethod
    def toFloat32(c: ColumnOrName) -> Column:
        return _c(c).cast("float")

    @staticmethod
    def toFloat64(c: ColumnOrName) -> Column:
        return _c(c).cast("double")

    @staticmethod
    def toFixed(c: ColumnOrName, scale: int) -> Column:
        return F.round(_c(c), scale)

    @staticmethod
    def parseDateTimeBestEffort(c: ColumnOrName) -> Column:
        return F.to_timestamp(_c(c))

    # ---- string ----------------------------------------------------------
    @staticmethod
    def lower(c: ColumnOrName) -> Column:
        return F.lower(_c(c))

    @staticmethod
    def upper(c: ColumnOrName) -> Column:
        return F.upper(_c(c))

    @staticmethod
    def concat(*cs: ColumnOrName) -> Column:
        return F.concat(*[_c(x) if not isinstance(x, Column) else x for x in cs])

    @staticmethod
    def substring(c: ColumnOrName, pos: int, length: int) -> Column:
        return F.substring(_c(c), pos, length)

    @staticmethod
    def length(c: ColumnOrName) -> Column:
        return F.length(_c(c))

    @staticmethod
    def splitByChar(sep: str, c: ColumnOrName) -> Column:
        return F.split(_c(c), re.escape(sep), -1)

    @staticmethod
    def trim(c: ColumnOrName) -> Column:
        return F.trim(_c(c))

    @staticmethod
    def replaceAll(c: ColumnOrName, pat: str, repl: str) -> Column:
        return F.replace(_c(c), F.lit(pat), F.lit(repl))

    @staticmethod
    def position(haystack: ColumnOrName, needle: str) -> Column:
        return F.instr(_c(haystack), needle)

    @staticmethod
    def startsWith(c: ColumnOrName, prefix: str) -> Column:
        return _c(c).startswith(prefix)

    @staticmethod
    def endsWith(c: ColumnOrName, suffix: str) -> Column:
        return _c(c).endswith(suffix)

    # ---- math ------------------------------------------------------------
    @staticmethod
    def round(c: ColumnOrName, scale: int = 0) -> Column:
        return F.round(_c(c), scale)

    @staticmethod
    def floor(c: ColumnOrName) -> Column:
        return F.floor(_c(c))

    @staticmethod
    def ceil(c: ColumnOrName) -> Column:
        return F.ceil(_c(c))

    @staticmethod
    def abs(c: ColumnOrName) -> Column:
        return F.abs(_c(c))

    @staticmethod
    def intDiv(a: ColumnOrName, b: Any) -> Column:
        bb = b if isinstance(b, Column) else F.lit(b)
        return F.floor(_c(a) / bb).cast("long")

    @staticmethod
    def modulo(a: ColumnOrName, b: Any) -> Column:
        bb = b if isinstance(b, Column) else F.lit(b)
        return _c(a) % bb

    @staticmethod
    def sqrt(c: ColumnOrName) -> Column:
        return F.sqrt(_c(c))

    @staticmethod
    def exp(c: ColumnOrName) -> Column:
        return F.exp(_c(c))

    @staticmethod
    def log(c: ColumnOrName) -> Column:
        return F.log(_c(c))

    @staticmethod
    def pow(a: ColumnOrName, b: Any) -> Column:
        return F.pow(_c(a), b)

    # ---- conditional -----------------------------------------------------
    @staticmethod
    def if_(cond: Column, then: Any, else_: Any) -> Column:
        return F.when(cond, then).otherwise(else_)

    @staticmethod
    def multiIf(*args: Any) -> Column:
        # multiIf(c1, v1, c2, v2, ..., default)
        if len(args) < 3 or len(args) % 2 == 0:
            raise ValueError("multiIf needs cond/value pairs plus a default")
        out = F.when(args[0], args[1])
        for i in range(2, len(args) - 1, 2):
            out = out.when(args[i], args[i + 1])
        return out.otherwise(args[-1])

    @staticmethod
    def coalesce(*cs: Any) -> Column:
        return F.coalesce(*[_c(x) if isinstance(x, str) else x for x in cs])

    @staticmethod
    def greatest(*cs: ColumnOrName) -> Column:
        return F.greatest(*[_c(x) for x in cs])

    @staticmethod
    def least(*cs: ColumnOrName) -> Column:
        return F.least(*[_c(x) for x in cs])

    # ---- hash ------------------------------------------------------------
    @staticmethod
    def cityHash64(*cs: ColumnOrName) -> Column:
        # DIFFERENT VALUES than ClickHouse cityHash64 — same 64-bit
        # distribution properties (documented divergence).
        return F.xxhash64(*[_c(x) for x in cs])

    @staticmethod
    def MD5(c: ColumnOrName) -> Column:
        return F.md5(_c(c).cast("binary"))

    @staticmethod
    def sipHash64(*cs: ColumnOrName) -> Column:
        return F.xxhash64(*[_c(x) for x in cs])

    # ---- array -----------------------------------------------------------
    @staticmethod
    def arrayElement(c: ColumnOrName, i: Any) -> Column:
        return F.element_at(_c(c), i)  # 1-based, like CH

    @staticmethod
    def arrayMap(fn, c: ColumnOrName) -> Column:
        return F.transform(_c(c), fn)

    @staticmethod
    def arrayFilter(fn, c: ColumnOrName) -> Column:
        return F.filter(_c(c), fn)

    @staticmethod
    def arrayJoin(c: ColumnOrName) -> Column:
        return F.explode(_c(c))

    @staticmethod
    def arrayAll(fn, c: ColumnOrName) -> Column:
        return F.forall(_c(c), fn)

    @staticmethod
    def arrayExists(fn, c: ColumnOrName) -> Column:
        return F.exists(_c(c), fn)

    @staticmethod
    def arraySum(c: ColumnOrName) -> Column:
        return F.aggregate(_c(c), F.lit(0.0), lambda acc, x: acc + x.cast("double"))

    @staticmethod
    def has(c: ColumnOrName, v: Any) -> Column:
        return F.array_contains(_c(c), v)

    @staticmethod
    def arrayLength(c: ColumnOrName) -> Column:
        return F.size(_c(c))

    @staticmethod
    def arraySort(c: ColumnOrName) -> Column:
        return F.sort_array(_c(c))

    @staticmethod
    def arrayDistinct(c: ColumnOrName) -> Column:
        return F.array_distinct(_c(c))

    @staticmethod
    def arraySlice(c: ColumnOrName, offset: int, length: int) -> Column:
        return F.slice(_c(c), offset, length)

    # ---- JSON ------------------------------------------------------------
    @staticmethod
    def JSONExtractString(c: ColumnOrName, key: str) -> Column:
        return F.get_json_object(_c(c), f"$.{key}")

    @staticmethod
    def JSONExtractInt(c: ColumnOrName, key: str) -> Column:
        return F.get_json_object(_c(c), f"$.{key}").cast("bigint")

    @staticmethod
    def JSONExtractFloat(c: ColumnOrName, key: str) -> Column:
        return F.get_json_object(_c(c), f"$.{key}").cast("double")

    @staticmethod
    def JSONExtractBool(c: ColumnOrName, key: str) -> Column:
        return F.get_json_object(_c(c), f"$.{key}").cast("boolean")

    @staticmethod
    def JSONHas(c: ColumnOrName, key: str) -> Column:
        return F.get_json_object(_c(c), f"$.{key}").isNotNull()

    @staticmethod
    def JSONExtractKeys(c: ColumnOrName) -> Column:
        return F.json_object_keys(_c(c))


ch = _CH()


# ---------------------------------------------------------------------------
# SQL-string dialect translation (the consumption-API passthrough surface).
# Function-NAME rewriting over the §2.9 vocabulary; structure (SELECT/JOIN/
# WHERE/OVER) is shared ANSI syntax between ClickHouse and Spark SQL.
# Unknown ClickHouse-only functions raise, loudly (SURVEY §7 hard part 3).
# ---------------------------------------------------------------------------

# name -> simple rename (arg-compatible)
_RENAME = {
    "toDate": "to_date",
    "toDayOfMonth": "dayofmonth",
    "toHour": "hour",
    "toMinute": "minute",
    "toYear": "year",
    "toMonth": "month",
    "now": "current_timestamp",
    "today": "current_date",
    "toString": "string",
    "lower": "lower",
    "upper": "upper",
    "concat": "concat",
    "substring": "substring",
    "length": "length",
    "trim": "trim",
    "round": "round",
    "floor": "floor",
    "ceil": "ceil",
    "abs": "abs",
    "coalesce": "coalesce",
    "greatest": "greatest",
    "least": "least",
    "if": "if",
    "countIf": "count_if",
    "uniq": "approx_count_distinct",
    "argMax": "max_by",
    "argMin": "min_by",
    "groupArray": "collect_list",
    "any": "first",
    "anyLast": "last",
    "quantile": "percentile_approx",
    "median": "median",
    "cityHash64": "xxhash64",
    "sipHash64": "xxhash64",
    "arrayJoin": "explode",
    "has": "array_contains",
    "arrayConcat": "concat",
    "arrayIntersect": "array_intersect",
    "arrayFlatten": "flatten",
    "arrayZip": "arrays_zip",
    "arrayMin": "array_min",
    "arrayMax": "array_max",
    # round-5 vocabulary widening (direct Spark builtins)
    "hasAny": "arrays_overlap",
    "toLastDayOfMonth": "last_day",
    "addMonths": "add_months",
    "sign": "signum",
    "isNaN": "isnan",
    "uniqCombined": "approx_count_distinct",
    "varPop": "var_pop",
    "varSamp": "var_samp",
    "stddevPop": "stddev_pop",
    "stddevSamp": "stddev_samp",
    "skewPop": "skewness",
    "levenshteinDistance": "levenshtein",
    "mapFromArrays": "map_from_arrays",
    "JSONExtractKeys": "json_object_keys",
    # map family (CH functions/tuple-map-functions); map() itself is the
    # same variadic k,v,k,v constructor in Spark and passes through
    "mapKeys": "map_keys",
    "mapValues": "map_values",
    "mapContains": "map_contains_key",
    # string formatting
    "concatWithSeparator": "concat_ws",
    "substringIndex": "substring_index",
    "lagInFrame": "lag",
    "leadInFrame": "lead",
    "avgIf": "avg_if",
    "sumIf": "sum_if",
    "ifNull": "nvl",
    "nullIf": "nullif",
    "startsWith": "startswith",
    "endsWith": "endswith",
    "toQuarter": "quarter",
    "toUnixTimestamp": "unix_timestamp",
    "addDays": "date_add",
    "subtractDays": "date_sub",
    "leftPad": "lpad",
    "rightPad": "rpad",
    "trimBoth": "trim",
}

# name -> template with {args} placeholders
_TEMPLATE = {
    "uniqExact": "count(DISTINCT {0})",
    "toStartOfDay": "date_trunc('day', {0})",
    "toStartOfHour": "date_trunc('hour', {0})",
    "toStartOfMinute": "date_trunc('minute', {0})",
    "toStartOfMonth": "to_date(date_trunc('month', {0}))",
    "toStartOfYear": "to_date(date_trunc('year', {0}))",
    "toStartOfWeek": "to_date(date_sub(date_trunc('week', date_add({0}, 1)), 1))",
    "toStartOfFifteenMinutes": (
        "timestamp_seconds(unix_timestamp({0}) - unix_timestamp({0}) % 900)"
    ),
    "toInt8": "cast({0} as tinyint)",
    "toInt16": "cast({0} as smallint)",
    "toInt32": "cast({0} as int)",
    "toInt64": "cast({0} as bigint)",
    "toUInt32": "cast({0} as bigint)",
    "toUInt64": "cast({0} as bigint)",
    "toFloat32": "cast({0} as float)",
    "toFloat64": "cast({0} as double)",
    "toFixed": "round({0}, {1})",
    "intDiv": "cast(floor({0} / {1}) as bigint)",
    "modulo": "({0} % {1})",
    "multiIf": None,  # handled specially below
    # the separator is a REGEX to Spark's split — wrap it in \\Q...\\E
    # (java.util.regex literal quoting) so '.' or '|' split on the literal
    # character, matching CH splitByChar semantics
    "splitByChar": "split({1}, concat('\\\\Q', {0}, '\\\\E'))",
    "arrayElement": "element_at({0}, {1})",
    "JSONExtractString": "get_json_object({0}, concat('$.', {1}))",
    "JSONExtractInt": "cast(get_json_object({0}, concat('$.', {1})) as bigint)",
    "JSONExtractFloat": "cast(get_json_object({0}, concat('$.', {1})) as double)",
    "dateDiff": None,  # handled specially
    "timestampDiff": None,  # alias of dateDiff (same special handler)
    "sumIf": None,
    "avgIf": None,
    # CH position(haystack, needle) is 1-based with swapped args vs locate
    "position": "locate({1}, {0})",
    "toYYYYMM": "cast(date_format({0}, 'yyyyMM') as int)",
    "toYYYYMMDD": "cast(date_format({0}, 'yyyyMMdd') as int)",
    # CH toDayOfWeek: Monday=1..Sunday=7; Spark dayofweek: Sunday=1..Saturday=7
    "toDayOfWeek": "((dayofweek({0}) + 5) % 7 + 1)",
    # URL family (CH functions/url-functions) via Spark's parse_url (JVM,
    # java.net.URI-based — CH tolerates malformed URLs more loosely; this
    # vocabulary targets well-formed URLs, NULL otherwise)
    "protocol": "parse_url({0}, 'PROTOCOL')",
    "domain": "parse_url({0}, 'HOST')",
    "path": "parse_url({0}, 'PATH')",
    "queryString": "parse_url({0}, 'QUERY')",
    "extractURLParameter": "parse_url({0}, 'QUERY', {1})",
    "cutQueryString": "regexp_replace({0}, '\\\\?.*$', '')",
    "topLevelDomain": "regexp_extract(parse_url({0}, 'HOST'), '\\\\.([^.]+)$', 1)",
    # array vocabulary (CH functions/array-functions).  Higher-order SQL
    # lambdas run JVM-side; the 0-based transform index i maps CH's 1-based
    # positions; CASE guards keep element_at inside valid 1-based bounds
    # under ANSI mode.
    # round-5 vocabulary widening (templated rewrites)
    "hasAll": "forall({1}, x -> array_contains({0}, x))",
    # CH kurtPop is NON-excess (mu4/sigma^4); Spark kurtosis is excess
    "kurtPop": "(kurtosis({0}) + 3.0d)",
    "left": "substring({0}, 1, {1})",
    "right": (
        "(CASE WHEN length({0}) <= {1} THEN {0} "
        "ELSE substring({0}, -cast({1} as int), {1}) END)"
    ),
    "toStartOfQuarter": "to_date(date_trunc('quarter', {0}))",
    "toStartOfISOYear": (
        "to_date(date_trunc('week', make_date(extract(yearofweek from {0}), 1, 4)))"
    ),
    "addHours": "({0} + make_interval(0, 0, 0, 0, {1}, 0, 0))",
    "addMinutes": "({0} + make_interval(0, 0, 0, 0, 0, {1}, 0))",
    "addSeconds": "({0} + make_interval(0, 0, 0, 0, 0, 0, {1}))",
    "subtractHours": "({0} - make_interval(0, 0, 0, 0, {1}, 0, 0))",
    "subtractMinutes": "({0} - make_interval(0, 0, 0, 0, 0, {1}, 0))",
    "subtractSeconds": "({0} - make_interval(0, 0, 0, 0, 0, 0, {1}))",
    # CH toTime: the time-of-day anchored on 1970-01-02
    "toTime": "timestamp_seconds(86400 + unix_timestamp({0}) % 86400)",
    # Int64-only contract: ClickHouse rotates within the operand's own
    # integer width (UInt8 rotates in 8 bits); Spark has no unsigned narrow
    # ints, so operands are widened to BIGINT and the rotate is 64-bit.
    # Results diverge from CH for 8/16/32-bit columns by design — documented
    # rather than silently masked, since the narrow-width result would also
    # need CH's unsigned wraparound to be faithful.
    "bitRotateLeft": "(shiftleft(CAST({0} AS BIGINT), {1}) | "
    "shiftrightunsigned(CAST({0} AS BIGINT), 64 - {1}))",
    "bitRotateRight": "(shiftrightunsigned(CAST({0} AS BIGINT), {1}) | "
    "shiftleft(CAST({0} AS BIGINT), 64 - {1}))",
    "toDecimal32": "cast({0} as decimal(9, {1}))",
    "toDecimal64": "cast({0} as decimal(18, {1}))",
    "isFinite": "(NOT isnan({0}) AND abs({0}) != double('Infinity'))",
    "isInfinite": "(abs({0}) = double('Infinity'))",
    "quantileExact": "percentile({0}, 0.5)",
    "medianExact": "percentile({0}, 0.5)",
    "domainWithoutWWW": (
        "regexp_replace(parse_url({0}, 'HOST'), '^www\\.', '')"
    ),
    "fragment": "parse_url({0}, 'REF')",
    "arrayEnumerate": "transform({0}, (x, i) -> i + 1)",
    "arrayReverse": "reverse({0})",
    "arraySlice": "slice({0}, {1}, {2})",
    "arrayStringConcat": "array_join({0}, {1})",
    "arraySum": "aggregate({0}, 0L, (a, b) -> a + b)",
    "arraySort": "array_sort({0})",
    "arrayDistinct": "array_distinct({0})",
    "arrayCumSum": (
        "transform({0}, (x, i) -> "
        "aggregate(slice({0}, 1, i + 1), 0L, (a, b) -> a + b))"
    ),
    "arrayDifference": (
        "transform({0}, (x, i) -> "
        "CASE WHEN i = 0 THEN 0L ELSE x - element_at({0}, i) END)"
    ),
    # encoding family (CH functions/encoding-functions).  CH base64Decode /
    # unhex return String; Spark's unbase64/unhex return BINARY, so cast
    # back.  hex() of a string hex-dumps its UTF-8 bytes, uppercase, in
    # both engines.
    "base64Encode": "base64({0})",
    "base64Decode": "cast(unbase64({0}) as string)",
    "hex": "hex({0})",
    "unhex": "cast(unhex({0}) as string)",
    # IP address family (CH functions/ip-address-functions).  IPv4 numbers
    # are plain UInt32 big-endian byte packs — pure integer/bit exprs, no
    # UDF.  Parens around {0} because the arg may be any expression.
    "IPv4NumToString": (
        "concat(cast(shiftright(({0}), 24) & 255 as string), '.', "
        "cast(shiftright(({0}), 16) & 255 as string), '.', "
        "cast(shiftright(({0}), 8) & 255 as string), '.', "
        "cast(({0}) & 255 as string))"
    ),
    "IPv4StringToNum": (
        "aggregate(transform(split({0}, '\\\\.'), x -> cast(x as bigint)), "
        "0L, (a, b) -> a * 256 + b)"
    ),
    # vector / distance family (CH functions/distance-functions) — array
    # folds, all JVM-side.  Fold order is the array order (left fold), the
    # same association a sequential implementation uses.
    "dotProduct": (
        "aggregate(zip_with({0}, {1}, (x, y) -> x * y), "
        "cast(0 as double), (a, b) -> a + b)"
    ),
    "L1Norm": "aggregate({0}, cast(0 as double), (a, x) -> a + abs(x))",
    "L2Norm": "sqrt(aggregate({0}, cast(0 as double), (a, x) -> a + x * x))",
    "LinfNorm": "array_max(transform({0}, x -> abs(x)))",
    "cosineDistance": (
        "(1 - aggregate(zip_with({0}, {1}, (x, y) -> x * y), "
        "cast(0 as double), (a, b) -> a + b) "
        "/ (sqrt(aggregate({0}, cast(0 as double), (a, x) -> a + x * x)) "
        "* sqrt(aggregate({1}, cast(0 as double), (a, x) -> a + x * x))))"
    ),
    # JSON object introspection (reference data_models.py:92-103 docstrings
    # use JSONExtractKeysAndValuesRaw over the props column).  CH returns
    # (key, RAW json text) tuples; get_json_object unquotes scalar values —
    # documented deviation (object/array values still arrive as JSON text)
    "JSONExtractKeysAndValuesRaw": (
        "transform(json_object_keys({0}), "
        "k -> struct(k AS key, get_json_object({0}, concat('$.', k)) AS value))"
    ),
    "JSONLength": "json_array_length({0})",
    # regex / string-matching helpers
    "match": "({0} RLIKE {1})",
    "extractAll": "regexp_extract_all({0}, {1}, 1)",
    "replaceAll": "replace({0}, {1}, {2})",
    "replaceRegexpAll": "regexp_replace({0}, {1}, {2})",
    # character n-grams ({0} referenced per window — a plain column leaf,
    # cheap under projection collapse)
    "ngrams": (
        "transform(sequence(1, greatest(length({0}) - ({1}) + 1, 0)), "
        "i -> substring({0}, i, {1}))"
    ),
    # UTF8-suffixed string functions: Spark's string functions are
    # codepoint-based already, so these are aliases of the plain forms
    "lengthUTF8": "length({0})",
    "positionUTF8": "locate({1}, {0})",
    "reverseUTF8": "reverse({0})",
    "substringUTF8": "substring({0}, {1}, {2})",
    "lowerUTF8": "lower({0})",
    "upperUTF8": "upper({0})",
    "trimLeft": "ltrim({0})",
    "trimRight": "rtrim({0})",
    # DateTime64 / epoch conversions (CH functions/type-conversion +
    # date-time); timeSlot is the fixed 30-minute interval floor
    "parseDateTime": "to_timestamp({0})",
    "parseDateTimeBestEffort": "to_timestamp({0})",
    "toUnixTimestamp64Milli": "unix_millis({0})",
    "toUnixTimestamp64Micro": "unix_micros({0})",
    "fromUnixTimestamp64Milli": "timestamp_millis({0})",
    "fromUnixTimestamp64Micro": "timestamp_micros({0})",
    "timeSlot": "timestamp_seconds((unix_timestamp({0}) DIV 1800) * 1800)",
    "yesterday": "date_sub(current_date(), 1)",
    # CH age('unit', start, end) counts COMPLETE elapsed units, which is
    # exactly Spark timestampdiff semantics (dateDiff, mapped above,
    # shares the spelling; CH's boundary-crossing nuance for dateDiff is
    # documented in SURVEY.md §2.9)
    # bit-manipulation family (CH functions/bit-functions) — plain operator
    # spellings, BIGINT domain
    "bitAnd": "(({0}) & ({1}))",
    "bitOr": "(({0}) | ({1}))",
    "bitXor": "(({0}) ^ ({1}))",
    "bitNot": "(~({0}))",
    "bitShiftLeft": "shiftleft({0}, CAST({1} AS INT))",
    "bitShiftRight": "shiftright({0}, CAST({1} AS INT))",
    "bitTest": "CAST((shiftright({0}, CAST({1} AS INT)) & 1) AS TINYINT)",
    "bitCount": "bit_count({0})",
    # CH's no-throw arithmetic variants
    "intDivOrZero": (
        "(CASE WHEN ({1}) = 0 THEN 0 "
        "ELSE CAST(floor(({0}) / ({1})) AS BIGINT) END)"
    ),
    "moduloOrZero": "(CASE WHEN ({1}) = 0 THEN 0 ELSE (({0}) % ({1})) END)",
    # misc math
    "exp2": "power(2, {0})",
    "exp10": "power(10, {0})",
    "intExp2": "CAST(power(2, {0}) AS BIGINT)",
    "e": "exp(1.0)",
    # emptiness + split-by-literal-string (regex metachars quoted like
    # splitByChar)
    "empty": "(length({0}) = 0)",
    "notEmpty": "(length({0}) > 0)",
    "splitByString": "split({1}, concat('\\\\Q', {0}, '\\\\E'))",
    # passthrough identities: Spark columns are nullable by default, so CH's
    # Nullable-wrapper plumbing is a no-op here (assumeNotNull keeps the
    # value; NULL handling follows the surrounding expression)
    "assumeNotNull": "({0})",
    "toNullable": "({0})",
    # higher-order array family, part 2 (CH puts the LAMBDA FIRST —
    # arrayMap(x -> ..., arr) — templates swap it into Spark's arr-first
    # order; the arg splitter keeps "(x, y) -> ..." intact because the
    # comma sits inside parens)
    "arrayMap": "transform({1}, {0})",
    "arrayFilter": "filter({1}, {0})",
    "arrayExists": "exists({1}, {0})",
    "arrayAll": "forall({1}, {0})",
    "arrayCount": "size(filter({1}, {0}))",
    # CH arrayFirst returns the element type's default when nothing
    # matches; this vocabulary surfaces NULL instead (documented deviation
    # — Spark has no default-value notion for arbitrary types)
    "arrayFirst": "try_element_at(filter({1}, {0}), 1)",
    "arrayFirstIndex": "array_position(transform({1}, {0}), true)",
    "indexOf": "array_position({0}, {1})",
    "countEqual": "size(filter({0}, __ce -> __ce <=> {1}))",
    "arrayCompact": (
        "filter({0}, (x, i) -> i = 0 OR NOT (x <=> element_at({0}, i)))"
    ),
    "arrayAvg": (
        "(aggregate({0}, cast(0 as double), (a, x) -> a + x) / size({0}))"
    ),
    "range": "sequence(0, ({0}) - 1)",
    # rounding family (CH functions/rounding-functions).  roundBankers maps
    # to Spark's bround (half-to-even); roundToExp2 extracts the highest
    # set bit via the binary-string length (exact for BIGINT — log2+floor
    # would be off-by-one at last-ulp boundaries); roundDuration/roundAge
    # are CH's fixed bucket ladders spelled as CASE.
    "roundBankers": "bround({0}, {1})",
    "roundToExp2": (
        "(CASE WHEN ({0}) < 1 THEN 0 ELSE "
        "CAST(power(2, length(conv(CAST({0} AS BIGINT), 10, 2)) - 1) AS BIGINT) "
        "END)"
    ),
    "roundDuration": (
        "(CASE WHEN ({0}) < 1 THEN 0"
        " WHEN ({0}) < 10 THEN 1 WHEN ({0}) < 30 THEN 10"
        " WHEN ({0}) < 60 THEN 30 WHEN ({0}) < 120 THEN 60"
        " WHEN ({0}) < 180 THEN 120 WHEN ({0}) < 240 THEN 180"
        " WHEN ({0}) < 300 THEN 240 WHEN ({0}) < 600 THEN 300"
        " WHEN ({0}) < 1200 THEN 600 WHEN ({0}) < 1800 THEN 1200"
        " WHEN ({0}) < 3600 THEN 1800 WHEN ({0}) < 7200 THEN 3600"
        " WHEN ({0}) < 18000 THEN 7200 WHEN ({0}) < 36000 THEN 18000"
        " ELSE 36000 END)"
    ),
    "roundAge": (
        "(CASE WHEN ({0}) < 1 THEN 0 WHEN ({0}) < 18 THEN 17"
        " WHEN ({0}) < 25 THEN 18 WHEN ({0}) < 35 THEN 25"
        " WHEN ({0}) < 45 THEN 35 WHEN ({0}) < 55 THEN 45"
        " ELSE 55 END)"
    ),
    # ISO calendar + name helpers (CH functions/date-time-functions).
    # Spark weekofyear IS the ISO week; YEAROFWEEK the ISO week-year.
    "toISOWeek": "weekofyear({0})",
    "toISOYear": "extract(YEAROFWEEK FROM {0})",
    "monthName": "date_format({0}, 'MMMM')",
    # string-search family (CH functions/string-search-functions)
    "positionCaseInsensitive": "locate(lower({1}), lower({0}))",
    "countSubstrings": (
        "CAST((length({0}) - length(replace({0}, {1}, ''))) / length({1}) "
        "AS BIGINT)"
    ),
    # bitmap cardinality (CH groupBitmap over a UInt column) — the exact
    # distinct count; set-algebra cardinalities (bitmapAndCardinality etc.)
    # are re-expressed as conditional aggregation, see
    # operators/chsql_geo.py agg_bitmap_cardinalities
    "groupBitmap": "count(DISTINCT {0})",
    # ---- round-6 vocabulary widening ----
    # string similarity / transformation
    "editDistance": "levenshtein({0}, {1})",
    "translate": "translate({0}, {1}, {2})",
    "initcap": "initcap({0})",
    # char-level Jaccard index: |chars(a) ∩ chars(b)| / |chars(a) ∪ chars(b)|
    # (CH stringJaccardIndex is byte-level; identical on ASCII inputs)
    "stringJaccardIndex": (
        "(CAST(size(array_intersect(array_distinct(split({0}, '')), "
        "array_distinct(split({1}, '')))) AS DOUBLE) / "
        "size(array_union(array_distinct(split({0}, '')), "
        "array_distinct(split({1}, '')))))"
    ),
    # date/time truncation (CH dateTrunc takes (unit, ts); Spark date_trunc
    # takes (fmt, ts) with the same unit names)
    "dateTrunc": "date_trunc({0}, {1})",
    "toStartOfFiveMinutes": (
        "timestamp_seconds(unix_timestamp({0}) - unix_timestamp({0}) % 300)"
    ),
    "toStartOfTenMinutes": (
        "timestamp_seconds(unix_timestamp({0}) - unix_timestamp({0}) % 600)"
    ),
    # CH toLastDayOfWeek (mode 0): round up to the Sunday ending the week
    # (a Sunday maps to itself); dayofweek is 1=Sunday..7=Saturday
    "toLastDayOfWeek": "date_add({0}, (8 - dayofweek({0})) % 7)",
    # array utilities
    "arrayProduct": (
        "aggregate({0}, cast(1 as double), (__ap_a, __ap_x) -> __ap_a * __ap_x)"
    ),
    "arrayUniq": "size(array_distinct({0}))",
    "arrayReverseSort": "reverse(array_sort({0}))",
    "arrayFlatten": "flatten({0})",
    "flatten": "flatten({0})",
    # rotate by n (n may exceed size; empty-safe via pmod on greatest(size,1))
    "arrayRotateLeft": (
        "concat(slice({0}, CAST(pmod({1}, greatest(size({0}), 1)) AS INT) + 1, "
        "size({0})), slice({0}, 1, CAST(pmod({1}, greatest(size({0}), 1)) AS INT)))"
    ),
    "arrayRotateRight": (
        "concat(slice({0}, size({0}) - CAST(pmod({1}, greatest(size({0}), 1)) "
        "AS INT) + 1, size({0})), slice({0}, 1, size({0}) - "
        "CAST(pmod({1}, greatest(size({0}), 1)) AS INT)))"
    ),
    # arrayShingles(arr, n): consecutive n-element windows (the shingle
    # generator behind the dedup family, as a first-class dialect fn)
    "arrayShingles": (
        "transform(sequence(1, greatest(size({0}) - ({1}) + 1, 0)), "
        "__sh_i -> slice({0}, __sh_i, {1}))"
    ),
    # tuples: CH tuple(a,b) / tupleElement(t, n) — Spark structs use
    # 1-based colN field names for unnamed struct(), matching CH indexing
    # (tuple itself is a variadic rename below)
    "tupleElement": "({0}).col{1}",
    # bits / numeric
    "bitHammingDistance": (
        "bit_count(CAST({0} AS BIGINT) ^ CAST({1} AS BIGINT))"
    ),
    "clamp": "least(greatest({0}, {1}), {2})",
    # tokenization splits
    "splitByWhitespace": "filter(split({0}, '\\\\s+'), __sw -> __sw != '')",
    "alphaTokens": "filter(split({0}, '[^A-Za-z]+'), __at -> __at != '')",
}

# geo family (CH functions/geo/*): generated cross-engine SQL arithmetic —
# see sql/geo.py for the exactness argument.  geoDistance (WGS84-adjusted in
# CH) is mapped to the same mean-radius great circle: the reference surface
# passes SQL through to CH, and callers needing ellipsoid precision are
# outside this vocabulary (documented approximation, <0.6% delta).
from moosestack_spark.sql import geo as _geo  # noqa: E402

_TEMPLATE.update(
    {
        "greatCircleDistance": _geo.great_circle_distance_sql(
            "{0}", "{1}", "{2}", "{3}"
        ),
        "geoDistance": _geo.great_circle_distance_sql("{0}", "{1}", "{2}", "{3}"),
        "geohashEncode": _geo.geohash_encode_sql("{0}", "{1}", "spark"),
    }
)

# ---- round-6b vocabulary widening ----
# dateName parts limited to year/month/weekday (the CH parts with clean
# cross-engine names); formatReadable* band edges follow CH's 1024^k /
# 1000^k ladders with 2-decimal DECIMAL rendering (ties cannot occur:
# k/1024 quotients are dyadic, and non-dyadic quotients never land exactly
# on a 2-decimal tie, so HALF_UP vs HALF_EVEN is moot); bar() renders
# eighth-blocks exactly like CH (U+2588 fulls + U+258F..U+2589 partial).
_W_BAR = (
    "least(greatest((CAST({0} AS DOUBLE) - ({1})) / (({2}) - ({1})) * ({3}), "
    "cast(0 as double)), cast(({3}) as double))"
)
_TEMPLATE.update(
    {
        "timeDiff": "(unix_timestamp({1}) - unix_timestamp({0}))",
        "dateName": (
            "(CASE WHEN {0} = 'year' THEN CAST(year({1}) AS STRING) "
            "WHEN {0} = 'month' THEN date_format({1}, 'MMMM') "
            "WHEN {0} = 'weekday' THEN date_format({1}, 'EEEE') END)"
        ),
        "toStartOfSecond": "date_trunc('second', {0})",
        "toMillisecond": "CAST(pmod(unix_millis({0}), 1000) AS INT)",
        # CH day numbering: 1970-01-01 is day 719528 since year zero
        "toDaysSinceYearZero": "(datediff({0}, DATE '1970-01-01') + 719528)",
        "fromDaysSinceYearZero": (
            "date_add(DATE '1970-01-01', CAST(({0}) - 719528 AS INT))"
        ),
        "regexpExtract": "regexp_extract({0}, {1}, {2})",
        "isIPv4String": (
            "(CASE WHEN {0} RLIKE "
            "'^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\\\.){{3}}"
            "(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$' THEN 1 ELSE 0 END)"
        ),
        "bitmaskToList": (
            "array_join(transform(filter(sequence(0, 62), __bm_i -> "
            "(CAST({0} AS BIGINT) & shiftleft(CAST(1 AS BIGINT), __bm_i)) "
            "!= 0), __bm_j -> CAST(shiftleft(CAST(1 AS BIGINT), __bm_j) "
            "AS STRING)), ',')"
        ),
        "widthBucket": "width_bucket({0}, {1}, {2}, {3})",
        "arrayJaccardIndex": (
            "(CAST(size(array_intersect({0}, {1})) AS DOUBLE) / "
            "size(array_union({0}, {1})))"
        ),
        # byte-level string hamming (== char-level on ASCII); unequal
        # lengths count the overhang (zip_with NULL padding is DISTINCT
        # from any char)
        "hammingDistance": (
            "size(filter(zip_with(split({0}, ''), split({1}, ''), "
            "(__ha, __hb) -> __ha IS DISTINCT FROM __hb), __h -> __h))"
        ),
        "mid": "substring({0}, {1}, {2})",
        "multiSearchAllPositions": (
            "transform({1}, __ms_n -> CAST(locate(__ms_n, {0}) AS BIGINT))"
        ),
        "hasSubstr": (
            "(CASE WHEN size({1}) > size({0}) THEN false ELSE "
            "exists(sequence(1, size({0}) - size({1}) + 1), __hs_i -> "
            "slice({0}, __hs_i, size({1})) = {1}) END)"
        ),
        "tokens": "filter(split({0}, '[^A-Za-z0-9]+'), __tk -> __tk != '')",
        "splitByRegexp": "split({1}, {0})",
        "arrayDotProduct": (
            "aggregate(zip_with({0}, {1}, (__dp_x, __dp_y) -> "
            "__dp_x * __dp_y), cast(0 as double), "
            "(__dp_a, __dp_v) -> __dp_a + __dp_v)"
        ),
        "formatReadableSize": (
            "(CASE WHEN ({0}) < 1024 THEN concat(CAST(CAST(({0}) AS "
            "DECIMAL(20,2)) AS STRING), ' B') "
            "WHEN ({0}) < 1048576 THEN concat(CAST(CAST(({0}) / 1024 AS "
            "DECIMAL(20,2)) AS STRING), ' KiB') "
            "WHEN ({0}) < 1073741824 THEN concat(CAST(CAST(({0}) / 1048576 "
            "AS DECIMAL(20,2)) AS STRING), ' MiB') "
            "WHEN ({0}) < 1099511627776 THEN concat(CAST(CAST(({0}) / "
            "1073741824 AS DECIMAL(20,2)) AS STRING), ' GiB') "
            "ELSE concat(CAST(CAST(({0}) / 1099511627776 AS DECIMAL(20,2)) "
            "AS STRING), ' TiB') END)"
        ),
        "formatReadableQuantity": (
            "(CASE WHEN ({0}) < 1000 THEN CAST(CAST(({0}) AS DECIMAL(20,2)) "
            "AS STRING) "
            "WHEN ({0}) < 1000000 THEN concat(CAST(CAST(({0}) / 1000 AS "
            "DECIMAL(20,2)) AS STRING), ' thousand') "
            "WHEN ({0}) < 1000000000 THEN concat(CAST(CAST(({0}) / 1000000 "
            "AS DECIMAL(20,2)) AS STRING), ' million') "
            "ELSE concat(CAST(CAST(({0}) / 1000000000 AS DECIMAL(20,2)) "
            "AS STRING), ' billion') END)"
        ),
        "bar": (
            "concat(repeat('█', CAST(floor(" + _W_BAR + ") AS INT)), "
            "element_at(array('', '▏', '▎', '▍', '▌', '▋', '▊', '▉'), "
            "CAST(floor((" + _W_BAR + " - floor(" + _W_BAR + ")) * 8) "
            "AS INT) + 1))"
        ),
    }
)

_RENAME.update(
    {
        "concatAssumeInjective": "concat",
        "initcapUTF8": "initcap",
    }
)

# ---- round-6c vocabulary widening ----
# gcd/lcm run Euclid inside a bounded aggregate() fold (92 iterations cover
# the 64-bit worst case — consecutive Fibonacci numbers); factorial guards
# n<=1 because Spark's sequence(1, 0) DESCENDS; byteSwap reassembles the 8
# bytes with unsigned shifts (disjoint, so + == |); the distance/regression
# aggregates are spelled from exact integer power sums so both engines
# compute the identical +,-,*,/,sqrt chain (those IEEE ops are correctly
# rounded everywhere; log/exp are not, and stay out of this surface).
_GCD = (
    "aggregate(sequence(1, 92), named_struct('a', CAST(abs({0}) AS BIGINT), "
    "'b', CAST(abs({1}) AS BIGINT)), (__g, __gi) -> if(__g.b = 0, __g, "
    "named_struct('a', __g.b, 'b', __g.a % __g.b)), __g -> __g.a)"
)
_SLR_K = (
    "(CAST(count({0}) * sum(({0}) * ({1})) - sum({0}) * sum({1}) AS DOUBLE)"
    " / (count({0}) * sum(({0}) * ({0})) - sum({0}) * sum({0})))"
)
_CUT_H = "split(parse_url({0}, 'HOST'), '\\\\.')"
_CUT_TAKE = (
    f"(CASE WHEN size({_CUT_H}) >= 3 AND length(element_at({_CUT_H}, -1)) = 2"
    f" AND element_at({_CUT_H}, -2) IN ('co', 'com', 'org', 'gov', 'ac', 'net')"
    f" THEN 3 ELSE least(size({_CUT_H}), 2) END)"
)
_TEMPLATE.update(
    {
        "gcd": f"({_GCD})",
        "lcm": (
            "(CASE WHEN ({0}) = 0 OR ({1}) = 0 THEN 0 ELSE "
            f"abs((CAST({{0}} AS BIGINT) div {_GCD}) * CAST({{1}} AS BIGINT)) "
            "END)"
        ),
        "factorial": (
            "(CASE WHEN ({0}) <= 1 THEN CAST(1 AS BIGINT) ELSE "
            "aggregate(sequence(1, CAST({0} AS INT)), CAST(1 AS BIGINT), "
            "(__f_a, __f_x) -> __f_a * __f_x) END)"
        ),
        "makeDate": "make_date({0}, {1}, {2})",
        "makeDateTime": "make_timestamp({0}, {1}, {2}, {3}, {4}, {5})",
        "toDayOfYear": "dayofyear({0})",
        "byteSwap": (
            "aggregate(sequence(0, 7), CAST(0 AS BIGINT), (__bs_a, __bs_i) ->"
            " __bs_a + shiftleft(shiftrightunsigned(CAST({0} AS BIGINT), "
            "8 * __bs_i) & 255, 8 * (7 - __bs_i)))"
        ),
        # sloppy-scan simpleJSON on clean JSON == path extraction
        "simpleJSONExtractString": "get_json_object({0}, concat('$.', {1}))",
        "JSONArrayLength": "json_array_length({0})",
        "L1Distance": (
            "aggregate(zip_with({0}, {1}, (__l1x, __l1y) -> "
            "abs(__l1x - __l1y)), cast(0 as double), "
            "(__l1a, __l1v) -> __l1a + __l1v)"
        ),
        "L2Distance": (
            "sqrt(aggregate(zip_with({0}, {1}, (__l2x, __l2y) -> "
            "(__l2x - __l2y) * (__l2x - __l2y)), cast(0 as double), "
            "(__l2a, __l2v) -> __l2a + __l2v))"
        ),
        "covarSamp": (
            "((sum(({0}) * ({1})) - sum({0}) * sum({1}) / count({0})) / "
            "(count({0}) - 1))"
        ),
        "boundingRatio": (
            "((CAST(max({1}) AS DOUBLE) - min({1})) / "
            "(CAST(max({0}) AS DOUBLE) - min({0})))"
        ),
        # tuple (k, b) surfaced as a named_struct so tupleElement works
        "simpleLinearRegression": (
            f"named_struct('col1', {_SLR_K}, "
            f"'col2', ((sum({{1}}) - {_SLR_K} * sum({{0}})) / count({{0}})))"
        ),
        "sumCount": "named_struct('col1', sum({0}), 'col2', count({0}))",
        # retention(c1, c2, c3): r[0] = c1 ever held; r[i] = c1 AND ci
        "retention": (
            "array(max(if({0}, 1, 0)), "
            "least(max(if({0}, 1, 0)), max(if({1}, 1, 0))), "
            "least(max(if({0}, 1, 0)), max(if({2}, 1, 0))))"
        ),
        "ifNotFinite": (
            "(CASE WHEN isnan(CAST({0} AS DOUBLE)) OR "
            "abs(CAST({0} AS DOUBLE)) = double('Infinity') THEN {1} "
            "ELSE {0} END)"
        ),
        "mapFilter": "map_filter({1}, {0})",
        # CH netloc = user:pass@host:port, which is exactly the URL
        # AUTHORITY component (parse_url has no separate PORT part)
        "netloc": "coalesce(parse_url({0}, 'AUTHORITY'), '')",
        # public-suffix handling is a documented shortlist (co/com/org/gov/
        # ac/net under 2-letter ccTLDs), not the full PSL snapshot CH ships
        "cutToFirstSignificantSubdomain": (
            f"array_join(slice({_CUT_H}, size({_CUT_H}) - {_CUT_TAKE} + 1, "
            f"{_CUT_TAKE}), '.')"
        ),
    }
)

_RENAME.update(
    {
        # this engine's SUM is already exact where it matters (decimal
        # internals per operators/_determinism.py) — Kahan is a no-op
        "sumKahan": "sum",
    }
)

# ---- round-6d vocabulary widening ----
# arrayFill/arrayReverseFill SPLICE the user's (translated) lambda into a
# filter() over a growing/shrinking slice — O(n^2) per array, fine for the
# dialect surface (documents carry short arrays; bulk fills belong in
# window operators).  arrayEnumerateDense ranks each element by first
# occurrence via array_position.
_TEMPLATE.update(
    {
        "arrayEnumerateDense": (
            "transform({0}, __ed_x -> size(array_distinct(slice({0}, 1, "
            "CAST(array_position({0}, __ed_x) AS INT)))))"
        ),
        # CH arrayFill(cond, arr): where cond(x) is false, carry the last
        # PRIOR element satisfying cond; leading non-matches keep their
        # original value
        "arrayFill": (
            "transform({1}, (__af_v, __af_i) -> coalesce(try_element_at("
            "filter(slice({1}, 1, __af_i + 1), {0}), -1), __af_v))"
        ),
        "arrayReverseFill": (
            "transform({1}, (__ar_v, __ar_i) -> coalesce(try_element_at("
            "filter(slice({1}, __ar_i + 1, size({1}) - __ar_i), {0}), 1), "
            "__ar_v))"
        ),
        "bitTestAll": (
            "((shiftrightunsigned(CAST({0} AS BIGINT), CAST({1} AS INT)) & 1)"
            " & (shiftrightunsigned(CAST({0} AS BIGINT), CAST({2} AS INT)) & 1))"
        ),
        "bitTestAny": (
            "((shiftrightunsigned(CAST({0} AS BIGINT), CAST({1} AS INT)) & 1)"
            " | (shiftrightunsigned(CAST({0} AS BIGINT), CAST({2} AS INT)) & 1))"
        ),
        "substringIndex": "substring_index({0}, {1}, {2})",
        "countMatches": "CAST(regexp_count({0}, {1}) AS BIGINT)",
    }
)

# ---- round-7 vocabulary widening ----
# Array/map/scalar batch.  arrayFold is CH's lambda-first left fold —
# Spark's aggregate() with the argument order rotated; the map helpers
# compose map_filter/map_concat (map_concat alone would collide on
# duplicate keys under the default EXCEPTION dedup policy, so mapUpdate
# filters the overridden keys out of the left map first).
_TEMPLATE.update(
    {
        # CH arrayFold((acc, x) -> ..., arr, init): Spark aggregate(arr,
        # init, (acc, x) -> ...) — same (acc, element) lambda parameter
        # order, so the lambda text passes straight through
        "arrayFold": "aggregate({1}, {2}, {0})",
        # arrayShiftLeft/Right(arr, n, fill): drop n from one end, pad the
        # other with fill (CH defaults fill to the type default; the
        # 3-arg explicit-fill form is the supported contract here)
        "arrayShiftLeft": (
            "concat(slice({0}, CAST({1} AS INT) + 1, "
            "greatest(size({0}) - CAST({1} AS INT), 0)), "
            "array_repeat({2}, least(CAST({1} AS INT), size({0}))))"
        ),
        "arrayShiftRight": (
            "concat(array_repeat({2}, least(CAST({1} AS INT), size({0}))), "
            "slice({0}, 1, greatest(size({0}) - CAST({1} AS INT), 0)))"
        ),
        # mapUpdate(m1, m2): m2 wins on key collisions
        "mapUpdate": (
            "map_concat(map_filter({0}, (__mu_k, __mu_v) -> "
            "NOT array_contains(map_keys({1}), __mu_k)), {1})"
        ),
        "mapContainsKeyLike": "exists(map_keys({0}), __mk_k -> __mk_k LIKE {1})",
        "mapExtractKeyLike": "map_filter({0}, (__me_k, __me_v) -> __me_k LIKE {1})",
        # scalar two-arg max/min and guarded sqrt
        "max2": "greatest({0}, {1})",
        "min2": "least({0}, {1})",
        "negate": "(-({0}))",
        "sqrtOrNull": "(CASE WHEN ({0}) < 0 THEN NULL ELSE sqrt({0}) END)",
        # innerProduct is dotProduct under its tuple-surface name
        "innerProduct": (
            "aggregate(zip_with({0}, {1}, (x, y) -> x * y), "
            "cast(0 as double), (a, b) -> a + b)"
        ),
        # LpNorm(arr, p) for numeric literal p
        "LpNorm": (
            "power(aggregate({0}, cast(0 as double), "
            "(a, x) -> a + power(abs(x), {1})), cast(1.0 as double) / ({1}))"
        ),
        # UTF8-suffixed aliases (Spark strings are codepoint-based already)
        "leftUTF8": "left({0}, {1})",
        "rightUTF8": "right({0}, {1})",
        "startsWithUTF8": "startswith({0}, {1})",
        "endsWithUTF8": "endswith({0}, {1})",
        # multiSearch* over an array literal of needles
        "multiSearchFirstPosition": (
            "coalesce(array_min(filter(transform({1}, "
            "__ms_n -> locate(__ms_n, {0})), __ms_p -> __ms_p > 0)), 0)"
        ),
        "multiSearchAnyCaseInsensitive": (
            "exists({1}, __ms_n -> locate(lower(__ms_n), lower({0})) > 0)"
        ),
    }
)

# URL / IP / time widening (round 7).  URLHierarchy follows the CH
# contract — ['proto://host/', 'proto://host/seg1/', ...,
# full URL last] — for no-query/no-fragment URLs (the documented subset;
# query-bearing hierarchies need CH's byte-walk).  The IPv4 CIDR pair is
# pure integer/bit algebra over the existing IPv4StringToNum fold;
# isIPv6String accepts full and '::'-compressed colon-hex forms (no
# IPv4-mapped tails — documented subset).
_URL_BASE = "regexp_extract({0}, '^([a-z]+://[^/?#]+)', 1)"
_URL_SEGS = (
    "filter(split(regexp_extract(substring({0}, "
    f"length({_URL_BASE}) + 1), '^[^?#]*', 0), '/'), __uh_s -> __uh_s != '')"
)
_ATON = (
    "aggregate(transform(split({{{n}}}, '\\\\.'), __ip_x -> "
    "cast(__ip_x as bigint)), 0L, (__ip_a, __ip_b) -> __ip_a * 256 + __ip_b)"
)
_CIDR_BITS = "CAST({1} AS INT)"
_TEMPLATE.update(
    {
        "queryStringAndFragment": (
            "concat(coalesce(parse_url({0}, 'QUERY'), ''), "
            "CASE WHEN parse_url({0}, 'REF') IS NOT NULL "
            "THEN concat('#', parse_url({0}, 'REF')) ELSE '' END)"
        ),
        "cutQueryStringAndFragment": "regexp_replace({0}, '[?#].*$', '')",
        "cutFragment": "regexp_replace({0}, '#.*$', '')",
        "cutWWW": "regexp_replace({0}, '^([a-z]+://)?www\\\\.', '$1')",
        "URLHierarchy": (
            f"concat(array(concat({_URL_BASE}, '/')), "
            f"transform(sequence(1, size({_URL_SEGS})), __uh_i -> "
            f"concat({_URL_BASE}, '/', "
            f"array_join(slice({_URL_SEGS}, 1, __uh_i), '/'), "
            f"IF(__uh_i < size({_URL_SEGS}), '/', ''))))"
        ),
        "URLPathHierarchy": (
            f"transform(sequence(1, size({_URL_SEGS})), __uh_i -> "
            f"concat('/', array_join(slice({_URL_SEGS}, 1, __uh_i), '/'), "
            f"IF(__uh_i < size({_URL_SEGS}), '/', '')))"
        ),
        "extractURLParameters": (
            "filter(split(coalesce(parse_url({0}, 'QUERY'), ''), '&'), "
            "__up_p -> __up_p != '')"
        ),
        "extractURLParameterNames": (
            "transform(filter(split(coalesce(parse_url({0}, 'QUERY'), ''), "
            "'&'), __up_p -> __up_p != ''), "
            "__up_p -> regexp_extract(__up_p, '^([^=]*)', 1))"
        ),
        # Hex-group forms only (full 8-group and '::'-compressed anywhere,
        # incl. leading '::1' and bare '::', with group counts bounded so
        # 9-group strings are rejected).  Documented deviation: the
        # IPv4-mapped dotted tail ('::ffff:1.2.3.4') and zone ids ('%eth0')
        # are not accepted; CH accepts both.
        "isIPv6String": (
            "({0} RLIKE '^(([0-9A-Fa-f]{{1,4}}:){{7}}[0-9A-Fa-f]{{1,4}}"
            "|([0-9A-Fa-f]{{1,4}}:){{1,7}}:"
            "|([0-9A-Fa-f]{{1,4}}:){{1,6}}:[0-9A-Fa-f]{{1,4}}"
            "|([0-9A-Fa-f]{{1,4}}:){{1,5}}(:[0-9A-Fa-f]{{1,4}}){{1,2}}"
            "|([0-9A-Fa-f]{{1,4}}:){{1,4}}(:[0-9A-Fa-f]{{1,4}}){{1,3}}"
            "|([0-9A-Fa-f]{{1,4}}:){{1,3}}(:[0-9A-Fa-f]{{1,4}}){{1,4}}"
            "|([0-9A-Fa-f]{{1,4}}:){{1,2}}(:[0-9A-Fa-f]{{1,4}}){{1,5}}"
            "|[0-9A-Fa-f]{{1,4}}:(:[0-9A-Fa-f]{{1,4}}){{1,6}}"
            "|:((:[0-9A-Fa-f]{{1,4}}){{1,7}}|:))$')"
        ),
        "isIPAddressInRange": (
            f"(shiftrightunsigned({_ATON.format(n=0)}, "
            f"32 - cast(element_at(split({{1}}, '/'), 2) as int)) = "
            f"shiftrightunsigned("
            "aggregate(transform(split(element_at(split({1}, '/'), 1), "
            "'\\\\.'), __ip_x -> cast(__ip_x as bigint)), 0L, "
            "(__ip_a, __ip_b) -> __ip_a * 256 + __ip_b), "
            "32 - cast(element_at(split({1}, '/'), 2) as int)))"
        ),
        # epoch-seconds (or string) -> timestamp, the CH constructor form
        "toDateTime": "cast({0} as timestamp)",
        "addQuarters": "add_months({0}, 3 * ({1}))",
        "subtractQuarters": "add_months({0}, -3 * ({1}))",
        # quarters numbered year*4 + (q-1) — matches CH's fixed-point count
        "toRelativeQuarterNum": "(year({0}) * 4 + quarter({0}) - 1)",
        # Sunday-start weeks anchored so 1970-01-04 begins week 1
        "toRelativeWeekNum": (
            "CAST(floor((datediff({0}, DATE '1970-01-01') + 4) / 7) AS BIGINT)"
        ),
        "snowflakeToDateTime": (
            "timestamp_millis(1288834974657 + "
            "shiftright(CAST({0} AS BIGINT), 22))"
        ),
        "dateTimeToSnowflake": (
            "shiftleft(unix_millis({0}) - 1288834974657, 22)"
        ),
        # 3-arg form: slots of {2} seconds covering [start, start+duration]
        "timeSlots": (
            "transform(sequence("
            "CAST(floor(unix_timestamp({0}) / ({2})) AS BIGINT), "
            "CAST(floor((unix_timestamp({0}) + ({1})) / ({2})) AS BIGINT)), "
            "__tsl -> timestamp_seconds(__tsl * ({2})))"
        ),
    }
)

# ---- round-7 batch c: readable formats, bit/string/date vocabulary ----
# formatReadableTimeDelta covers the days/hours/minutes/seconds subset
# (CH adds years/months above that — documented boundary); concat_ws
# skips the NULL components, and the seconds component also fires when
# the whole delta is zero so the output is never empty.
_FRTD_PART = (
    "CASE WHEN {cnt} {cond} THEN concat(CAST({cnt} AS STRING), ' {unit}', "
    "IF({cnt} = 1, '', 's')) END"
)
_TEMPLATE.update(
    {
        "formatReadableTimeDelta": (
            "concat_ws(', ', "
            + _FRTD_PART.format(cnt="(CAST({0} AS BIGINT) div 86400)", cond="> 0", unit="day")
            + ", "
            + _FRTD_PART.format(cnt="((CAST({0} AS BIGINT) div 3600) % 24)", cond="> 0", unit="hour")
            + ", "
            + _FRTD_PART.format(cnt="((CAST({0} AS BIGINT) div 60) % 60)", cond="> 0", unit="minute")
            + ", "
            + _FRTD_PART.format(
                cnt="(CAST({0} AS BIGINT) % 60)",
                cond="> 0 OR CAST({0} AS BIGINT) = 0",
                unit="second",
            )
            + ")"
        ),
        "bin": "bin({0})",
        "unbin": "cast(conv({0}, 2, 10) as bigint)",
        # map sorted by key (struct ordering: key is the first entry field)
        "mapSort": "map_from_entries(array_sort(map_entries({0})))",
        # days since the Modified Julian epoch 1858-11-17
        "toModifiedJulianDay": "datediff({0}, DATE '1858-11-17')",
        "fromModifiedJulianDay": "date_add(DATE '1858-11-17', cast({0} as int))",
        "addDate": "({0} + {1})",
        "subDate": "({0} - {1})",
        # CH interval constructors -> Spark make_interval(y, mo, w, d, h, mi, s)
        "toIntervalYear": "make_interval({0})",
        "toIntervalMonth": "make_interval(0, {0})",
        "toIntervalWeek": "make_interval(0, 0, {0})",
        "toIntervalDay": "make_interval(0, 0, 0, {0})",
        "toIntervalHour": "make_interval(0, 0, 0, 0, {0})",
        "toIntervalMinute": "make_interval(0, 0, 0, 0, 0, {0})",
        "toIntervalSecond": "make_interval(0, 0, 0, 0, 0, 0, {0})",
        "soundex": "soundex({0})",
        "repeat": "repeat({0}, {1})",
        "space": "repeat(' ', {0})",
        # running clamp s_i = max(0, s_{i-1} + x_i): a true recursion, so
        # an array-accumulator fold (not the slice-resum trick arrayCumSum
        # uses — clamping is order-dependent)
        "arrayCumSumNonNegative": (
            "slice(aggregate({0}, array(0L), (__cs_acc, __cs_x) -> "
            "array_append(__cs_acc, "
            "greatest(element_at(__cs_acc, -1) + __cs_x, 0L))), "
            "2, size({0}))"
        ),
        # lambda-first like arrayFirst; same documented deviation as
        # arrayFirst: CH returns the element type's default (0 for
        # numerics) when nothing matches, this vocabulary returns NULL
        # (Spark has no default-value notion for arbitrary types)
        "arrayLast": "try_element_at(filter({1}, {0}), -1)",
        "arrayLastIndex": (
            "coalesce(array_max(transform(transform({1}, {0}), "
            "(__al_b, __al_i) -> IF(__al_b, __al_i + 1, 0))), 0)"
        ),
        # positions past the shorter string count as differing (CH counts
        # the length difference); both-empty guarded (sequence(1,0) would
        # run DESCENDING in Spark)
        "byteHammingDistance": (
            "IF(greatest(length({0}), length({1})) = 0, 0L, "
            "aggregate(transform(sequence(1, greatest(length({0}), "
            "length({1}))), __bh_i -> IF(substring({0}, __bh_i, 1) <=> "
            "substring({1}, __bh_i, 1), 0L, 1L)), 0L, "
            "(__bh_a, __bh_b) -> __bh_a + __bh_b))"
        ),
    }
)

# arrayAUC(scores, labels) — TIE-FREE contract (distinct scores; CH
# averages tied ranks, gates construct residue-distinct fixtures): rank
# positives by ascending score, AUC = (rank_sum - P(P+1)/2) / (P*N).
_AUC_SORTED = (
    "array_sort(zip_with({0}, {1}, (__au_s, __au_l) -> "
    "named_struct('s', cast(__au_s as double), 'l', __au_l)))"
)
_AUC_RS = (
    "aggregate(transform(" + _AUC_SORTED + ", (__au_e, __au_i) -> "
    "IF(__au_e.l = 1, cast(__au_i as bigint) + 1, 0L)), 0L, "
    "(__au_a, __au_b) -> __au_a + __au_b)"
)
_AUC_P = "aggregate({1}, 0L, (__au_a, __au_x) -> __au_a + IF(__au_x = 1, 1L, 0L))"
_TEMPLATE.update(
    {
        "arrayAUC": (
            f"(cast({_AUC_RS} - {_AUC_P} * ({_AUC_P} + 1) div 2 as double) "
            f"/ cast({_AUC_P} * (size({{1}}) - {_AUC_P}) as double))"
        ),
    }
)

# ngramDistance: DISTINCT-4-gram symmetric-difference ratio (CH uses the
# multiset variant; the set-based subset is the documented contract here):
# 1 - |A ∩ B| / |A ∪ B|, 0.0 when both sides have no 4-grams.
_NGRAMS = (
    "IF(length({n}) >= 4, array_distinct(transform("
    "sequence(1, length({n}) - 3), __ng_i -> substring({n}, __ng_i, 4))), "
    "array())"
)
_TEMPLATE.update(
    {
        "ngramDistance": (
            "(CASE WHEN size(array_union("
            + _NGRAMS.format(n="{0}")
            + ", "
            + _NGRAMS.format(n="{1}")
            + ")) = 0 THEN cast(0.0 as double) ELSE "
            "1.0 - cast(size(array_intersect("
            + _NGRAMS.format(n="{0}")
            + ", "
            + _NGRAMS.format(n="{1}")
            + ")) as double) / cast(size(array_union("
            + _NGRAMS.format(n="{0}")
            + ", "
            + _NGRAMS.format(n="{1}")
            + ")) as double) END)"
        ),
    }
)

# ---- round-8 vocabulary widening: vector distances, subsequence/split
# string ops, millisecond arithmetic, URL significant-subdomain ----
_L2NORM_SUM = (
    "aggregate(transform({0}, __l2n_t -> __l2n_t * __l2n_t), "
    "cast(0 as double), (__l2n_a, __l2n_v) -> __l2n_a + __l2n_v)"
)
_TEMPLATE.update(
    {
        "splitByNonAlpha": (
            "filter(split({0}, '[^A-Za-z]+'), __sna_x -> __sna_x != '')"
        ),
        "L2SquaredDistance": (
            "aggregate(zip_with({0}, {1}, (__l2sx, __l2sy) -> "
            "(__l2sx - __l2sy) * (__l2sx - __l2sy)), cast(0 as double), "
            "(__l2sa, __l2sv) -> __l2sa + __l2sv)"
        ),
        "LinfDistance": (
            "aggregate(zip_with({0}, {1}, (__lix, __liy) -> "
            "abs(__lix - __liy)), cast(0 as double), "
            "(__lia, __liv) -> greatest(__lia, __liv))"
        ),
        "L2Normalize": (
            f"transform({{0}}, __l2n_x -> __l2n_x / sqrt({_L2NORM_SUM}))"
        ),
        # subsequence test as a matched-prefix fold over haystack chars
        # (split('', '') yields a trailing '' element — it matches no
        # needle char, so the count is unaffected)
        "hasSubsequence": (
            "(aggregate(split({0}, ''), 0, (__hs_a, __hs_c) -> __hs_a + "
            "IF(__hs_a < length({1}) AND __hs_c = substring({1}, "
            "__hs_a + 1, 1), 1, 0)) >= length({1}))"
        ),
        "translateUTF8": "translate({0}, {1}, {2})",
        "ascii": "ascii({0})",
        "rightPadUTF8": "rpad({0}, {1}, {2})",
        "regexpQuoteMeta": (
            r"regexp_replace({0}, '([\\.^$|?*+()\\[\\]{{}}\\\\])', "
            r"'\\\\$1')"
        ),
        "addMilliseconds": "timestampadd(MILLISECOND, {1}, {0})",
        "subtractMilliseconds": "timestampadd(MILLISECOND, -({1}), {0})",
        "toUnixTimestamp64Nano": "(unix_micros({0}) * 1000)",
        "toYYYYMMDDhhmmss": (
            "CAST(date_format({0}, 'yyyyMMddHHmmss') AS BIGINT)"
        ),
        "toDecimalString": "CAST(CAST({0} AS DECIMAL(38, {1})) AS STRING)",
        # same documented public-suffix shortlist as
        # cutToFirstSignificantSubdomain above
        "firstSignificantSubdomain": (
            f"element_at({_CUT_H}, size({_CUT_H}) - {_CUT_TAKE} + 1)"
        ),
        # math truncate toward zero (CH trunc 1-arg form)
        "trunc": (
            "(CASE WHEN ({0}) >= 0 THEN FLOOR({0}) ELSE CEIL({0}) END)"
        ),
        # Spark timestamps are microsecond-precision: truncation to the
        # microsecond is the identity (documented)
        "toStartOfMicrosecond": "cast({0} as timestamp)",
        # 'Stable' variants are numeric-stability implementation choices in
        # CH; this engine's power-sum spellings are exact, so they alias
        "covarSampStable": (
            "((sum(({0}) * ({1})) - sum({0}) * sum({1}) / count({0})) / "
            "(count({0}) - 1))"
        ),
        # aggregate half: population covariance (same power-sum spelling
        # as covarSamp), weighted mean, bitwise aggregate family
        "covarPop": (
            "((sum(({0}) * ({1})) - sum({0}) * sum({1}) / count({0})) / "
            "count({0}))"
        ),
        "avgWeighted": "(sum(({0}) * ({1})) / sum({1}))",
        "groupBitAnd": "bit_and({0})",
        "groupBitOr": "bit_or({0})",
        "groupBitXor": "bit_xor({0})",
    }
)

# ---- round-9 vocabulary widening ----
# relative-epoch bucket numbers, JSON validity (variant try-parse),
# normalizeQuery literal masking, bounding-box slope, Kahan sum (exact sums
# make compensation moot here), timestamp-ordered delta sum (the
# deterministic spelling of CH deltaSum — explicit order column), and the
# unbiased sample skewness/kurtosis over exact integer power sums (shared
# builder, sql/stats_moments.py, so the DuckDB oracle replays the
# IDENTICAL double chain).
from moosestack_spark.sql import stats_moments as _sm  # noqa: E402

_TEMPLATE.update(
    {
        "toRelativeMinuteNum": (
            "CAST(FLOOR(unix_timestamp({0}) / 60) AS BIGINT)"
        ),
        "toRelativeHourNum": (
            "CAST(FLOOR(unix_timestamp({0}) / 3600) AS BIGINT)"
        ),
        "toRelativeDayNum": (
            "CAST(FLOOR(unix_timestamp({0}) / 86400) AS BIGINT)"
        ),
        "isValidJSON": "(try_parse_json({0}) IS NOT NULL)",
        # CH normalizeQuery masks literals with '?': quoted strings first,
        # then standalone numbers (token-boundary guarded WITHOUT
        # lookbehind so the same regex runs under RE2 in the oracle);
        # identifiers like x12 are preserved.
        "normalizeQuery": (
            "regexp_replace(regexp_replace({0}, \"'[^']*'\", '?'), "
            "'(^|[^A-Za-z_0-9])[0-9]+(\\\\.[0-9]+)?', '$1?')"
        ),
        # (boundingRatio / sumKahan are NOT redefined here: they were
        # registered in the round-6 batch — chsql_geo.py — with a
        # tie-robust range-ratio spelling that the green r6c_agg gate pins;
        # redefining them round-9 silently changed that gate's values)
        # CH deltaSumTimestamp(value, ts): sum of positive deltas of value
        # in ts order.  Spelled as an ordered fold over the collected
        # group (struct accumulator carries the running sum + previous
        # value); bounded by group size — same contract as groupArray.
        "deltaSumTimestamp": (
            "aggregate(array_sort(collect_list(struct({1} AS __dst_t, "
            "CAST({0} AS BIGINT) AS __dst_v))), "
            "struct(CAST(0 AS BIGINT) AS s, CAST(NULL AS BIGINT) AS p), "
            "(__dst_a, __dst_e) -> struct(__dst_a.s + (CASE WHEN "
            "__dst_a.p IS NOT NULL AND __dst_e.__dst_v > __dst_a.p THEN "
            "__dst_e.__dst_v - __dst_a.p ELSE CAST(0 AS BIGINT) END), "
            "__dst_e.__dst_v), __dst_a -> __dst_a.s)"
        ),
        "skewSamp": _sm.skew_samp_sql("{0}"),
        "kurtSamp": _sm.kurt_samp_sql("{0}"),
        # DateTime64 with explicit precision: truncate micros to 10^(6-p)
        # (unix_micros fits double exactly below 2^53, so the FLOOR chain
        # is exact)
        "toDateTime64": (
            "timestamp_micros(CAST(FLOOR(unix_micros(to_timestamp({0})) "
            "/ power(10, 6 - ({1}))) * power(10, 6 - ({1})) AS BIGINT))"
        ),
        # fill integer-key gaps between min and max key with 0 (the CH
        # two-array form's default); pure HOF, no shuffle
        "mapPopulateSeries": (
            "map_from_arrays("
            "sequence(array_min(map_keys({0})), array_max(map_keys({0}))), "
            "transform(sequence(array_min(map_keys({0})), "
            "array_max(map_keys({0}))), "
            "__mp_k -> coalesce(element_at({0}, __mp_k), 0)))"
        ),
        # token = maximal alphanumeric run; the needle is regexp-quoted so
        # any constant string is matched literally at token boundaries
        "hasToken": (
            "(({0}) RLIKE concat('(^|[^0-9A-Za-z])', "
            "regexp_replace({1}, '([\\\\.^$|?*+()\\\\[\\\\]{{}}\\\\\\\\])', "
            "'\\\\\\\\$1'), '($|[^0-9A-Za-z])'))"
        ),
        # CH returns '' for undecodable input (vs base64Decode's throw)
        "tryBase64Decode": (
            "coalesce(CAST(try_to_binary({0}, 'base64') AS STRING), '')"
        ),
    }
)

# Functions whose CH semantics depend on insertion order or randomness —
# a blind rewrite would be nondeterministic; refuse with a pointer to the
# deterministic operator that covers the use case.
_REFUSE = {
    "anyHeavy": (
        "anyHeavy is insertion-order-dependent (heavy-hitter guess); use "
        "the deterministic space-saving top-k "
        "(agg_space_saving_topk, operators/aggregates_ext.py)"
    ),
    "arrayShuffle": (
        "arrayShuffle is nondeterministic; sort by a keyed hash instead "
        "(array_sort over xxhash64(element, seed)) for replayable "
        "permutation"
    ),
    "deltaSum": (
        "deltaSum depends on insertion order; use "
        "deltaSumTimestamp(value, ts), which orders explicitly"
    ),
}

_RENAME.update(
    {
        # sketch-surface aliases: CH's theta/t-digest sketches land on the
        # same approximate operators as uniq/quantile (documented — the
        # sketch FORMAT differs, the query surface is the estimate)
        "uniqTheta": "approx_count_distinct",
        "quantileTDigest": "percentile_approx",
        # exactness makes the 'Stable' numeric variants plain aliases
        "corrStable": "corr",
    }
)

_KNOWN_SPARK_PASSTHROUGH = frozenset(
    """select from where group by order having limit offset join on as and or not
    count sum avg min max distinct case when then else end cast between in like
    ilike is null desc asc over partition rows range unbounded preceding
    following current row row_number rank dense_rank lag lead first_value
    last_value union all intersect except with""".split()
)

_FN_CALL = re.compile(r"\b([A-Za-z_][A-Za-z0-9_]*)\s*\(")

# CH parametric aggregates f(params)(args) -> Spark rewrites.
# Handlers take (params, args) as already-translated strings.
def _qexact_weighted(p: list[str], a: list[str]) -> str:
    """quantileExactWeighted(level)(x, w): smallest x whose cumulative
    weight (in x-ascending order) reaches ceil(level * total_weight) —
    exact, integer-weighted.  Both aggregates (SUM of weights, the sorted
    pair list) are bound OUTSIDE the fold lambda via the single-element
    struct trick, because Spark refuses aggregate calls inside lambda
    bodies; the fold itself is a plain scan with a (cum, answer) struct
    accumulator — group-size-bounded like groupArray."""
    x = f"CAST({a[0]} AS DOUBLE)"
    w = f"CAST({a[1]} AS BIGINT)"
    thr = f"CAST(ceil({p[0]} * SUM({w})) AS BIGINT)"
    arr = f"array_sort(collect_list(struct({x} AS x, {w} AS w)))"
    return (
        f"element_at(transform(array(struct({thr} AS t, {arr} AS arr)), "
        "__qw -> aggregate(__qw.arr, "
        "struct(CAST(0 AS BIGINT) AS c, CAST(NULL AS DOUBLE) AS a), "
        "(__qw_acc, __qw_e) -> struct(__qw_acc.c + __qw_e.w, "
        "CASE WHEN __qw_acc.a IS NULL AND __qw_acc.c + __qw_e.w >= __qw.t "
        "THEN __qw_e.x ELSE __qw_acc.a END), "
        "__qw_acc -> __qw_acc.a)), 1)"
    )


_PARAMETRIC = {
    "quantile": lambda p, a: f"percentile_approx({a[0]}, {p[0]})",
    "quantileExactWeighted": _qexact_weighted,
    "quantileExact": lambda p, a: f"percentile({a[0]}, {p[0]})",
    "quantiles": lambda p, a: f"percentile_approx({a[0]}, array({', '.join(p)}))",
    "quantilesExact": lambda p, a: f"percentile({a[0]}, array({', '.join(p)}))",
    # uniqUpTo(N): exact distinct count up to N, N+1 beyond
    "uniqUpTo": lambda p, a: f"least(count(DISTINCT {a[0]}), {p[0]} + 1)",
    "groupArraySorted": (
        lambda p, a: f"slice(array_sort(collect_list({a[0]})), 1, {p[0]})"
    ),
    "topK": None,  # raise below: needs the DataFrame operator
    "histogram": None,
    "sequenceMatch": None,
}


def _split_args(argstr: str) -> list[str]:
    """Split a function arg string on top-level commas."""
    args, depth, cur, in_str = [], 0, [], False
    i = 0
    while i < len(argstr):
        chr_ = argstr[i]
        if in_str:
            cur.append(chr_)
            if chr_ == "'":
                in_str = False
        elif chr_ == "'":
            in_str = True
            cur.append(chr_)
        elif chr_ in "([":
            depth += 1
            cur.append(chr_)
        elif chr_ in ")]":
            depth -= 1
            cur.append(chr_)
        elif chr_ == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(chr_)
        i += 1
    if cur:
        args.append("".join(cur).strip())
    return args


def _find_close(s: str, open_idx: int) -> int:
    depth, in_str = 0, False
    for i in range(open_idx, len(s)):
        c = s[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError(f"unbalanced parens in SQL near index {open_idx}")


_ARRAY_JOIN = re.compile(
    r"\b(LEFT\s+)?ARRAY\s+JOIN\s+([A-Za-z_][\w.]*(?:\([^()]*\))?)\s+AS\s+"
    r"([A-Za-z_]\w*)",
    re.IGNORECASE,
)


def translate_ch_sql(sql: str) -> str:
    """Rewrite ClickHouse function names in a SQL string to Spark SQL.

    Handles nested calls (recurses into arguments).  Raises on ClickHouse
    functions outside the supported vocabulary.

    Also rewrites the CH ``[LEFT] ARRAY JOIN expr AS alias`` CLAUSE to
    Spark's ``LATERAL VIEW [OUTER] explode(expr) __aj AS alias`` — same
    syntactic position after the table reference, same unnesting
    semantics (LEFT keeps rows with empty arrays, as OUTER does).
    """

    def _aj(m: re.Match) -> str:
        outer = "OUTER " if m.group(1) else ""
        return (
            f"LATERAL VIEW {outer}explode({m.group(2)}) "
            f"__aj_{m.group(3)} AS {m.group(3)}"
        )

    def _in_string(pos: int, spans: list[tuple[int, int]]) -> int:
        """Return the span end if pos falls inside a string literal span,
        else -1."""
        for a, b in spans:
            if a <= pos < b:
                return b
        return -1

    def _string_spans(s: str) -> list[tuple[int, int]]:
        spans, i2, in_s, start = [], 0, False, 0
        while i2 < len(s):
            if s[i2] == "'":
                if in_s:
                    spans.append((start, i2 + 1))
                    in_s = False
                else:
                    in_s, start = True, i2
            i2 += 1
        if in_s:
            spans.append((start, len(s)))
        return spans

    # FROM t FINAL (read-time ReplacingMergeTree dedup) and FROM t SAMPLE x
    # (probabilistic sampling) would PARSE in Spark — FINAL as a table
    # alias, SAMPLE x as garbage — and silently change row multiplicity.
    # Refuse loudly and point at the deterministic operators.
    if re.search(r"\bFROM\s+[\w.`\"]+\s+FINAL\b", sql, re.IGNORECASE):
        raise ValueError(
            "FINAL reads depend on the table's engine ORDER BY key; use the "
            "read-time dedup operator (catalog/engine_views.py, gate "
            "engine_replacing_dedup) instead of the FINAL modifier"
        )
    if re.search(r"\bSAMPLE\s+\d", sql, re.IGNORECASE):
        raise ValueError(
            "SAMPLE n is probabilistic and engine-specific; use the "
            "deterministic hash sampler (ops/corpus.py, gate "
            "sample_hash_mod) for replayable sampling"
        )
    # CH numbers(N) / numbers(offset, N) table function -> an exploded
    # sequence subquery named `number` (spelled with Spark passthrough
    # names so the function rewriter below leaves it alone — `range` has a
    # CH template meaning)
    sql = re.sub(
        r"\bnumbers\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)",
        lambda m: (
            f"(SELECT explode(sequence({m.group(1)}, "
            f"{int(m.group(1)) + int(m.group(2)) - 1})) AS number)"
        ),
        sql,
        flags=re.IGNORECASE,
    )
    sql = re.sub(
        r"\bnumbers\s*\(\s*(\d+)\s*\)",
        lambda m: (
            f"(SELECT explode(sequence(0, {int(m.group(1)) - 1})) AS number)"
        ),
        sql,
        flags=re.IGNORECASE,
    )
    sql = _ARRAY_JOIN.sub(_aj, sql)
    # PREWHERE is CH's manual pushdown hint; Catalyst pushes WHERE
    # predicates into the scan itself, so PREWHERE IS WHERE here.  When a
    # query has both, fold the PREWHERE condition into the WHERE with AND.
    m_pw = re.search(
        r"\bPREWHERE\b(.*?)(\bWHERE\b|\bGROUP\s+BY\b|\bORDER\s+BY\b"
        r"|\bLIMIT\b|\bSETTINGS\b|$)",
        sql,
        re.IGNORECASE | re.DOTALL,
    )
    if m_pw:
        cond, nxt = m_pw.group(1).strip(), m_pw.group(2)
        if nxt.upper() == "WHERE":
            sql = (
                sql[: m_pw.start()]
                + f"WHERE ({cond}) AND "
                + sql[m_pw.end() :]
            )
        else:
            sql = sql[: m_pw.start()] + f"WHERE {cond} " + sql[m_pw.start(2) :]
    # trailing SETTINGS clause: execution knobs with no Spark equivalent —
    # stripped (AQE/conf govern execution here)
    sql = re.sub(
        r"\bSETTINGS\s+\w+\s*=\s*\S+(\s*,\s*\w+\s*=\s*\S+)*\s*$",
        "",
        sql,
        flags=re.IGNORECASE,
    )
    # trailing FORMAT clause: wire-format directive, not part of the query
    sql = re.sub(r"\bFORMAT\s+\w+\s*$", "", sql, flags=re.IGNORECASE)
    # CH distributed-join modifiers: GLOBAL (ship the right side to every
    # shard — Catalyst's broadcast decision) and ALL (the default
    # multiplicity) are execution hints here — stripped.  ANY JOIN changes
    # row multiplicity and has no blind rewrite; it raises.
    if re.search(r"\bANY\s+(LEFT\s+|RIGHT\s+|INNER\s+)?JOIN\b", sql, re.IGNORECASE):
        raise ValueError(
            "ANY JOIN changes match multiplicity; rewrite as an explicit "
            "rank-1-per-key join (see operators/chsql_ext.py sort_distinct_on)"
        )
    sql = re.sub(
        r"\b(GLOBAL|ALL)\s+(?=(LEFT|RIGHT|INNER|FULL|CROSS|JOIN)\b)",
        "",
        sql,
        flags=re.IGNORECASE,
    )
    out = []
    i = 0
    spans = _string_spans(sql)
    while True:
        m = _FN_CALL.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        # never rewrite inside a string literal
        span_end = _in_string(m.start(), spans)
        if span_end >= 0:
            out.append(sql[i:span_end])
            i = span_end
            continue
        name = m.group(1)
        open_idx = m.end() - 1
        close_idx = _find_close(sql, open_idx)
        inner = sql[open_idx + 1 : close_idx]
        args = [translate_ch_sql(a) for a in _split_args(inner)] if inner.strip() else []
        out.append(sql[i : m.start()])

        # CH parametric-aggregate call syntax f(params)(args): detect a
        # second argument list immediately after the first.  Without this
        # branch a renamed function silently emitted broken SQL
        # (quantile(0.9)(x) -> percentile_approx(0.9)(x)).
        j2 = close_idx + 1
        while j2 < len(sql) and sql[j2].isspace():
            j2 += 1
        if j2 < len(sql) and sql[j2] == "(":
            close2 = _find_close(sql, j2)
            inner2 = sql[j2 + 1 : close2]
            args2 = (
                [translate_ch_sql(a) for a in _split_args(inner2)]
                if inner2.strip()
                else []
            )
            handler = _PARAMETRIC.get(name)
            if handler is None:
                raise ValueError(
                    f"parametric ClickHouse call {name}(...)(...)  is not in "
                    "the SQL translation vocabulary; use the DataFrame "
                    "operator (operators/aggregates*.py) or add a handler in "
                    "_PARAMETRIC"
                )
            out.append(handler(args, args2))
            i = close2 + 1
            continue

        if name == "multiIf":
            if len(args) < 3 or len(args) % 2 == 0:
                raise ValueError("multiIf needs cond/value pairs plus default")
            parts = ["CASE"]
            for j in range(0, len(args) - 1, 2):
                parts.append(f"WHEN {args[j]} THEN {args[j+1]}")
            parts.append(f"ELSE {args[-1]} END")
            out.append(" ".join(parts))
        elif name in ("dateDiff", "age", "timestampDiff"):
            unit = args[0].strip("'\"")
            out.append(f"timestampdiff({unit}, {args[1]}, {args[2]})")
        elif name == "sumIf":
            out.append(f"sum(CASE WHEN {args[1]} THEN {args[0]} END)")
        elif name == "toStartOfInterval":
            # toStartOfInterval(ts, INTERVAL n unit) -> epoch-aligned floor
            # bucket via integer second arithmetic (matches CH alignment for
            # second/minute/hour/day units; week/month go through the
            # dedicated toStartOf* functions)
            m2 = re.match(
                r"(?i)^\s*INTERVAL\s+(\d+)\s+(SECOND|MINUTE|HOUR|DAY)S?\s*$",
                args[1],
            )
            if not m2:
                raise ValueError(
                    "toStartOfInterval supports INTERVAL n SECOND/MINUTE/HOUR/DAY"
                )
            secs = int(m2.group(1)) * {
                "second": 1,
                "minute": 60,
                "hour": 3600,
                "day": 86400,
            }[m2.group(2).lower()]
            out.append(
                f"timestamp_seconds((unix_timestamp({args[0]}) DIV {secs}) * {secs})"
            )
        elif name in ("tumbleStart", "tumbleEnd", "hopStart", "hopEnd"):
            # CH time-window functions (WindowView vocabulary).  Windows
            # align to the epoch; hop windows of size w advancing by h
            # start at multiples of h, and the scalar hopStart/hopEnd
            # return the EARLIEST window containing t:
            #   hopStart = floor(t/h)*h - w + h,  hopEnd = hopStart + w
            # (tuple-returning tumble()/hop() are WindowView-only and out
            # of the scalar surface).
            def _ivl_secs(txt: str) -> int:
                m3 = re.match(
                    r"(?i)^\s*INTERVAL\s+(\d+)\s+(SECOND|MINUTE|HOUR|DAY)S?\s*$",
                    txt,
                )
                if not m3:
                    raise ValueError(
                        f"{name} supports INTERVAL n SECOND/MINUTE/HOUR/DAY"
                    )
                return int(m3.group(1)) * {
                    "second": 1, "minute": 60, "hour": 3600, "day": 86400,
                }[m3.group(2).lower()]

            ts_arg = args[0]
            if name.startswith("tumble"):
                size = _ivl_secs(args[1])
                start = f"(unix_timestamp({ts_arg}) DIV {size}) * {size}"
                secs = start if name == "tumbleStart" else f"{start} + {size}"
            else:
                hop, win = _ivl_secs(args[1]), _ivl_secs(args[2])
                if win % hop != 0:
                    raise ValueError("hop window size must be a multiple of the hop")
                first = (
                    f"(unix_timestamp({ts_arg}) DIV {hop}) * {hop} - {win} + {hop}"
                )
                secs = first if name == "hopStart" else f"{first} + {win}"
            out.append(f"timestamp_seconds({secs})")
        elif name == "arrayReduce":
            # meta-function: arrayReduce('agg', arr) applies an aggregate
            # over array elements — mapped to the matching array fold
            agg = args[0].strip("'\"").lower()
            arr = args[1]
            reducers = {
                "sum": f"aggregate({arr}, 0L, (a, b) -> a + b)",
                "min": f"array_min({arr})",
                "max": f"array_max({arr})",
                "count": f"size({arr})",
                "avg": (
                    f"(aggregate({arr}, cast(0 as double), (a, b) -> a + b)"
                    f" / size({arr}))"
                ),
                "uniqexact": f"size(array_distinct({arr}))",
            }
            if agg not in reducers:
                raise ValueError(
                    f"arrayReduce supports {sorted(reducers)}, got {agg!r}"
                )
            out.append(reducers[agg])
        elif name == "format":
            # CH format('{}-{}', a, b) — {} placeholders -> printf %s for
            # format_string (positional {0} forms are not supported)
            fmt = args[0].strip()
            if not (fmt.startswith("'") and fmt.endswith("'")):
                raise ValueError("format needs a literal format string")
            if re.search(r"\{\d", fmt):
                raise ValueError("format: positional {n} placeholders unsupported")
            spark_fmt = fmt[1:-1].replace("%", "%%").replace("{}", "%s")
            out.append(f"format_string('{spark_fmt}', {', '.join(args[1:])})")
        elif name == "formatDateTime":
            # CH formatDateTime(ts, '%Y-%m-%d ...') — strftime-style codes
            # mapped onto Spark's date_format pattern letters
            fmt = args[1].strip()
            if not (fmt.startswith("'") and fmt.endswith("'")):
                raise ValueError("formatDateTime needs a literal format string")
            mapping = {
                "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH",
                "%M": "mm", "%i": "mm", "%S": "ss",
                "%F": "yyyy-MM-dd", "%T": "HH:mm:ss",
                "%j": "DDD", "%e": "d", "%a": "EEE", "%b": "MMM",
            }
            body = fmt[1:-1]
            out_fmt, i2 = [], 0
            while i2 < len(body):
                if body[i2] == "%" and i2 + 1 < len(body):
                    code = body[i2 : i2 + 2]
                    if code == "%%":
                        out_fmt.append("%")
                    elif code in mapping:
                        out_fmt.append(mapping[code])
                    else:
                        raise ValueError(f"formatDateTime code {code!r} unsupported")
                    i2 += 2
                else:
                    # literal chars; quote pattern letters for date_format
                    c = body[i2]
                    out_fmt.append(f"'{c}'" if c.isalpha() else c)
                    i2 += 1
            out.append(f"date_format({args[0]}, '{''.join(out_fmt)}')")
        elif name == "toTimeZone":
            # session tz is pinned UTC (session.py); render the wall-clock
            # of the target zone
            out.append(f"from_utc_timestamp({args[0]}, {args[1]})")
        elif name in ("multiSearchAny", "multiSearchFirstIndex"):
            # variadic: (haystack, needle1, needle2, ...).  CH also accepts
            # an array literal second arg; the varargs spelling is the
            # supported form here.
            if len(args) < 2:
                raise ValueError(f"{name} needs a haystack and 1+ needles")
            hay, needles = args[0], args[1:]
            if name == "multiSearchAny":
                out.append(
                    "(" + " OR ".join(f"locate({n}, {hay}) > 0" for n in needles) + ")"
                )
            else:
                # CH: 1-based index of the needle whose match is LEFTMOST in
                # the haystack (not first in argument order), 0 if none;
                # ties broken by argument order via strict < in the fold
                structs = ", ".join(
                    f"named_struct('p', locate({n}, {hay}), 'i', {j + 1})"
                    for j, n in enumerate(needles)
                )
                out.append(
                    f"aggregate(array({structs}), "
                    f"named_struct('p', 2147483647, 'i', 0), "
                    f"(acc, s) -> IF(s.p > 0 AND s.p < acc.p, s, acc)).i"
                )
        elif name == "avgIf":
            out.append(f"avg(CASE WHEN {args[1]} THEN {args[0]} END)")
        elif name == "transform" and len(args) in (3, 4):
            # CH transform(x, from, to[, default]) is VALUE MAPPING —
            # x==from[i] -> to[i], else default (or x itself) — NOT Spark's
            # higher-order array transform; without this branch the name
            # passed through as the Spark builtin and silently changed
            # semantics.  The 2-arg lambda form still passes through.
            x, frm, to = args[0], args[1], args[2]
            default = args[3] if len(args) == 4 else x
            pos = f"array_position({frm}, {x})"
            out.append(
                f"(CASE WHEN {pos} > 0 THEN element_at({to}, CAST({pos} AS INT)) "
                f"ELSE {default} END)"
            )
        elif name == "caseWithExpression":
            # caseWithExpression(x, m1, r1, ..., default) -> CASE x WHEN .. END
            if len(args) < 4 or len(args) % 2 != 0:
                raise ValueError(
                    "caseWithExpression needs expr, match/result pairs, default"
                )
            parts = [f"CASE {args[0]}"]
            for j in range(1, len(args) - 1, 2):
                parts.append(f"WHEN {args[j]} THEN {args[j + 1]}")
            parts.append(f"ELSE {args[-1]} END")
            out.append(" ".join(parts))
        elif name == "arrayResize":
            a, n = args[0], args[1]
            fill = args[2] if len(args) == 3 else "NULL"
            out.append(
                f"(CASE WHEN size({a}) >= {n} THEN slice({a}, 1, {n}) "
                f"ELSE concat({a}, array_repeat({fill}, "
                f"CAST({n} AS INT) - size({a}))) END)"
            )
        elif name == "arrayPushBack":
            out.append(f"concat({args[0]}, array({args[1]}))")
        elif name == "arrayPushFront":
            out.append(f"concat(array({args[1]}), {args[0]})")
        elif name == "arrayPopBack":
            out.append(f"slice({args[0]}, 1, greatest(size({args[0]}) - 1, 0))")
        elif name == "arrayPopFront":
            out.append(f"slice({args[0]}, 2, greatest(size({args[0]}) - 1, 0))")
        elif name == "extractGroups":
            # CH extractGroups(s, 'pattern') returns the capture groups of
            # the FIRST match as an array.  The group count is read from
            # the LITERAL pattern (unescaped, non-(?:...) open parens), so
            # the rewrite can emit one regexp_extract per group.
            if len(args) != 2 or not re.match(r"^'.*'$", args[1].strip()):
                raise ValueError(
                    "extractGroups needs (expr, 'literal pattern')"
                )
            pat = args[1].strip()[1:-1]
            n_groups = len(re.findall(r"(?<!\\)\((?!\?)", pat))
            if n_groups == 0:
                raise ValueError("extractGroups pattern has no capture group")
            parts = ", ".join(
                f"regexp_extract({args[0]}, {args[1]}, {g})"
                for g in range(1, n_groups + 1)
            )
            out.append(f"array({parts})")
        elif name == "arrayEnumerateUniq":
            # occurrence index of each element among its equals so far
            a = args[0]
            out.append(
                f"transform({a}, (x, i) -> "
                f"size(filter(slice({a}, 1, i + 1), y -> y <=> x)))"
            )
        elif name == "mortonEncode" and len(args) == 2:
            # 2D x 16-bit subset (documented; CH supports wider tuples):
            # bit-interleave via 32 disjoint-bit terms summed.  Built
            # programmatically — a template would be unreadable.
            terms = []
            for i in range(16):
                terms.append(
                    f"shiftleft(shiftright(CAST({args[0]} AS BIGINT), {i}) & 1, {2 * i})"
                )
                terms.append(
                    f"shiftleft(shiftright(CAST({args[1]} AS BIGINT), {i}) & 1, {2 * i + 1})"
                )
            out.append("(" + " + ".join(terms) + ")")
        elif name == "mortonDecode":
            # mortonDecode(2, code) -> tuple(x, y); only the 2D form maps
            if args[0].strip() != "2":
                raise NotImplementedError(
                    "mortonDecode: only dimension 2 is supported"
                )
            xs = " + ".join(
                f"shiftleft(shiftright(CAST({args[1]} AS BIGINT), {2 * i}) & 1, {i})"
                for i in range(16)
            )
            ys = " + ".join(
                f"shiftleft(shiftright(CAST({args[1]} AS BIGINT), {2 * i + 1}) & 1, {i})"
                for i in range(16)
            )
            out.append(f"named_struct('col1', ({xs}), 'col2', ({ys}))")
        elif name == "IPv4CIDRToRange":
            # (ip, bits) -> tuple of dotted-quad range bounds.  Pure
            # integer/bit algebra over the IPv4StringToNum fold; built
            # programmatically because lo/hi each appear four times
            aton = (
                f"aggregate(transform(split({args[0]}, '\\\\.'), "
                "__ip_x -> cast(__ip_x as bigint)), 0L, "
                "(__ip_a, __ip_b) -> __ip_a * 256 + __ip_b)"
            )
            nbits = f"cast({args[1]} as int)"
            lo = f"(shiftleft(shiftrightunsigned({aton}, 32 - {nbits}), 32 - {nbits}))"
            hi = f"({lo} | (shiftleft(1L, 32 - {nbits}) - 1))"

            def _ntoa(v: str) -> str:
                return (
                    f"concat(cast(shiftright({v}, 24) & 255 as string), '.', "
                    f"cast(shiftright({v}, 16) & 255 as string), '.', "
                    f"cast(shiftright({v}, 8) & 255 as string), '.', "
                    f"cast({v} & 255 as string))"
                )

            out.append(
                f"named_struct('col1', {_ntoa(lo)}, 'col2', {_ntoa(hi)})"
            )
        elif name == "extractAllGroupsVertical":
            # per-MATCH array of capture groups.  The group count must be
            # known at translate time, so the pattern must be a string
            # LITERAL (the overwhelmingly common spelling; a dynamic
            # pattern has no static arity and is refused loudly).
            pat = args[1].strip()
            if not (pat.startswith("'") and pat.endswith("'")):
                raise ValueError(
                    "extractAllGroupsVertical needs a literal pattern "
                    "(the capture-group count fixes the output arity)"
                )
            n_groups = re.compile(pat[1:-1]).groups
            if n_groups == 0:
                raise ValueError(
                    "extractAllGroupsVertical pattern has no capture group"
                )
            inner = ", ".join(
                ["__eag_x"]
                + [
                    f"element_at(regexp_extract_all({args[0]}, {args[1]}, "
                    f"{g}), __eag_i + 1)"
                    for g in range(2, n_groups + 1)
                ]
            )
            out.append(
                f"transform(regexp_extract_all({args[0]}, {args[1]}, 1), "
                f"(__eag_x, __eag_i) -> array({inner}))"
            )
        elif name == "fromUnixTimestamp" and len(args) == 1:
            out.append(f"timestamp_seconds({args[0]})")
        elif name == "tuple":
            # CH tuple(a, b, ...) indexes fields 1..n; Spark struct() would
            # name fields after source columns, so build named_struct with
            # explicit colN names to keep tupleElement({0}).colN stable
            fields = ", ".join(
                f"'col{i + 1}', {a}" for i, a in enumerate(args)
            )
            out.append(f"named_struct({fields})")
        elif name in _REFUSE:
            raise ValueError(f"ClickHouse function {name!r}: {_REFUSE[name]}")
        elif name in _TEMPLATE and _TEMPLATE[name] is not None:
            out.append(_TEMPLATE[name].format(*args))
        elif name in _RENAME:
            out.append(f"{_RENAME[name]}({', '.join(args)})")
        elif name.lower() in _KNOWN_SPARK_PASSTHROUGH or _is_spark_builtin(name):
            out.append(f"{name}({', '.join(args)})")
        else:
            raise ValueError(
                f"ClickHouse function {name!r} is not in the supported "
                f"translation vocabulary (SURVEY.md §2.9); add a mapping in "
                f"moosestack_spark/sql/ch_functions.py"
            )
        i = close_idx + 1
    return "".join(out)


_SPARK_BUILTINS_CACHE: set[str] | None = None


def _is_spark_builtin(name: str) -> bool:
    """Accept names Spark SQL itself knows (shared ANSI vocabulary)."""
    global _SPARK_BUILTINS_CACHE
    if _SPARK_BUILTINS_CACHE is None:
        try:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                return _fallback_builtin(name)
            _SPARK_BUILTINS_CACHE = {
                r.function.split(".")[-1].lower()
                for r in spark.sql("SHOW FUNCTIONS").collect()
            }
        except Exception:
            return _fallback_builtin(name)
    return name.lower() in _SPARK_BUILTINS_CACHE


_FALLBACK_BUILTINS = frozenset(
    """count sum avg min max count_if approx_count_distinct count_distinct
    max_by min_by collect_list collect_set first last percentile_approx median
    to_date to_timestamp date_trunc date_add date_sub datediff months_between
    unix_timestamp timestamp_seconds year month dayofmonth dayofweek hour
    minute second current_timestamp current_date lower upper concat substring
    substr length split trim ltrim rtrim replace instr lpad rpad regexp_extract
    regexp_replace round floor ceil abs sqrt exp log pow power greatest least
    coalesce nullif if nvl cast string element_at explode transform filter
    forall exists aggregate array_contains size sort_array array_distinct
    slice get_json_object json_tuple from_json to_json json_object_keys
    xxhash64 md5 sha1 sha2 crc32 hash row_number rank dense_rank lag lead
    first_value last_value ntile cume_dist percent_rank when case struct
    named_struct array map sequence""".split()
)


def _fallback_builtin(name: str) -> bool:
    return name.lower() in _FALLBACK_BUILTINS
