"""Reference-vocabulary parity sweep.

SURVEY.md §2.9's contract is the set of ClickHouse functions the reference
templates/examples actually use in SQL passthrough.  This sweep pins that
EVERY such name translates — if the reference corpus grows a new function
family, add it here first and the test fails until the translator covers
it.  (-State/-Merge combinators are intentionally absent: the engine
maintains finished aggregate values instead, SURVEY.md §4.2; rand()/
randomUUID are nondeterministic by design and outside the oracled
vocabulary.)
"""

from __future__ import annotations

import pytest

from moosestack_spark.sql.ch_functions import translate_ch_sql

# name -> representative call as it appears in reference templates
REFERENCE_USED = {
    "JSONExtractKeysAndValuesRaw": "JSONExtractKeysAndValuesRaw(j)",
    "abs": "abs(x)",
    "argMax": "argMax(a, b)",
    "arrayAll": "arrayAll(x -> x > 0, a)",
    "arrayElement": "arrayElement(a, 1)",
    "arrayJoin": "arrayJoin(a)",
    "arrayMap": "arrayMap(x -> x + 1, a)",
    "ceil": "ceil(x)",
    "cityHash64": "cityHash64(x)",
    "concat": "concat(a, b)",
    "countIf": "countIf(x > 0)",
    "floor": "floor(x)",
    "groupArray": "groupArray(x)",
    "has": "has(a, 1)",
    "length": "length(s)",
    "lower": "lower(s)",
    "now": "now()",
    "parseDateTime": "parseDateTime(s)",
    "range": "range(5)",
    "round": "round(x, 2)",
    "substring": "substring(s, 1, 2)",
    "toDate": "toDate(s)",
    "toDayOfMonth": "toDayOfMonth(d)",
    "toFixed": "toFixed(x, 2)",
    "toInt32": "toInt32(x)",
    "toStartOfDay": "toStartOfDay(d)",
    "toStartOfFifteenMinutes": "toStartOfFifteenMinutes(d)",
    "toStartOfHour": "toStartOfHour(d)",
    "toStartOfMonth": "toStartOfMonth(d)",
    "toStartOfWeek": "toStartOfWeek(d)",
    "toString": "toString(x)",
    "uniqExact": "uniqExact(x)",
}


@pytest.mark.parametrize("name", sorted(REFERENCE_USED))
def test_reference_used_function_translates(name):
    out = translate_ch_sql(f"SELECT {REFERENCE_USED[name]} FROM t")
    assert out  # translation produced SQL without raising


def test_clause_prepass_handles_ch_surface():
    assert "LATERAL VIEW explode(arr)" in translate_ch_sql(
        "SELECT x FROM t ARRAY JOIN arr AS x"
    )
    assert "OUTER explode" in translate_ch_sql(
        "SELECT x FROM t LEFT ARRAY JOIN arr AS x"
    )
    out = translate_ch_sql("SELECT a FROM t PREWHERE x > 1 WHERE y < 2")
    assert "PREWHERE" not in out and "(x > 1) AND" in out
    assert "SETTINGS" not in translate_ch_sql(
        "SELECT a FROM t SETTINGS max_threads=4"
    )
    assert "FORMAT" not in translate_ch_sql("SELECT a FROM t FORMAT JSON")
    assert "GLOBAL" not in translate_ch_sql(
        "SELECT a FROM t GLOBAL LEFT JOIN u ON t.k = u.k"
    )
    # UNION ALL must survive the ALL-join strip
    assert "UNION ALL" in translate_ch_sql("SELECT a FROM t UNION ALL SELECT a FROM u")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="ANY JOIN"):
        translate_ch_sql("SELECT a FROM t ANY LEFT JOIN u ON t.k = u.k")


def test_arg_splitter_adversarial_cases():
    from moosestack_spark.sql.ch_functions import _split_args

    assert _split_args("'a,b', g(x, 'y(z'), [1,2]") == [
        "'a,b'", "g(x, 'y(z')", "[1,2]"
    ]
    assert _split_args("(x, y) -> x + y, arr") == ["(x, y) -> x + y", "arr"]
    assert _split_args("") == []
    assert _split_args("f(g(h(a,b),c),d), e") == ["f(g(h(a,b),c),d)", "e"]


def test_translate_preserves_strings_with_ch_names_inside():
    # a function NAME inside a string literal must not be rewritten
    out = translate_ch_sql("SELECT 'toDate(x)' AS s, toDate(d) FROM t")
    assert "'toDate(x)'" in out and "to_date(d)" in out


def test_translate_nested_calls():
    out = translate_ch_sql(
        "SELECT roundBankers(arraySum(arrayMap(x -> toFloat64(x), a)), 2) FROM t"
    )
    assert "bround" in out and "aggregate" in out and "transform" in out


def test_star_except_passes_through():
    # CH `SELECT * EXCEPT(col)` is native Spark 4 syntax — passthrough
    out = translate_ch_sql("SELECT * EXCEPT(a) FROM t")
    assert "EXCEPT(a)" in out


def test_final_modifier_refuses_loudly():
    # FROM t FINAL would PARSE in Spark (FINAL becomes a table alias) and
    # silently drop the read-time dedup semantics
    with pytest.raises(ValueError, match="engine_replacing_dedup"):
        translate_ch_sql("SELECT a FROM t FINAL WHERE b = 1")


def test_sample_clause_refuses_loudly():
    with pytest.raises(ValueError, match="sample_hash_mod"):
        translate_ch_sql("SELECT a FROM t SAMPLE 0.1")


def test_sample_as_identifier_still_fine():
    out = translate_ch_sql("SELECT sample_col FROM samples WHERE x = 1")
    assert "sample_col" in out


def test_extract_groups_rewrite():
    out = translate_ch_sql(
        "SELECT extractGroups(s, '(\\\\d+)-(\\\\w+)') FROM t"
    )
    assert out.count("regexp_extract") == 2 and out.startswith("SELECT array(")
    with pytest.raises(ValueError, match="no capture group"):
        translate_ch_sql("SELECT extractGroups(s, 'abc') FROM t")
    with pytest.raises(ValueError, match="literal pattern"):
        translate_ch_sql("SELECT extractGroups(s, p) FROM t")


def test_is_ipv6_string_edge_cases(spark):
    # '::'-compressed forms anywhere (incl. leading), bounded group counts;
    # dotted-quad tails and zone ids are the documented out-of-subset cases
    cases = [
        ("::1", True),
        ("::", True),
        ("1::", True),
        ("fe80::1", True),
        ("2001:db8::1", True),
        ("1:2:3:4:5:6:7:8", True),
        ("1:2:3:4:5:6:7:8:9", False),  # 9 groups, no compression
        ("1:2:3:4:5:6:7:8:9::", False),  # >8 groups with compression
        ("2001:db8::1::2", False),  # double compression
        ("10.0.0.1", False),
        ("", False),
        ("g::1", False),  # non-hex digit
    ]
    exprs = ", ".join(
        f"isIPv6String('{s}') AS c{i}" for i, (s, _) in enumerate(cases)
    )
    row = spark.sql(translate_ch_sql(f"SELECT {exprs}")).collect()[0]
    for i, (s, want) in enumerate(cases):
        assert row[f"c{i}"] is want, f"isIPv6String({s!r}) != {want}"


def test_order_dependent_aggs_refuse_with_pointer():
    """anyHeavy/arrayShuffle/deltaSum are insertion-order- or
    randomness-dependent: a blind rewrite would silently change results,
    so the translator refuses and names the deterministic replacement."""
    import pytest

    from moosestack_spark.sql.ch_functions import translate_ch_sql

    with pytest.raises(ValueError, match="space-saving"):
        translate_ch_sql("SELECT anyHeavy(x) FROM t")
    with pytest.raises(ValueError, match="xxhash64"):
        translate_ch_sql("SELECT arrayShuffle(a) FROM t")
    with pytest.raises(ValueError, match="deltaSumTimestamp"):
        translate_ch_sql("SELECT deltaSum(v) FROM t")


def test_r9_scalar_vocab_values(spark):
    from moosestack_spark.sql.ch_functions import translate_ch_sql

    row = spark.sql(
        translate_ch_sql(
            "SELECT toRelativeMinuteNum(toDateTime(3600)) AS m, "
            "toRelativeHourNum(toDateTime(7205)) AS h, "
            "toRelativeDayNum(toDateTime(200000)) AS d, "
            "isValidJSON('[1,2]') AS v1, isValidJSON('nope') AS v2, "
            "normalizeQuery('WHERE a=42 AND s=''x'' OR col7>1.5') AS nq"
        )
    ).collect()[0]
    assert (row.m, row.h, row.d) == (60, 2, 2)
    assert row.v1 is True and row.v2 is False
    assert row.nq == "WHERE a=? AND s=? OR col7>?"


def test_template_keys_registered_exactly_once():
    """dict.update silently overwrites: a round-9 re-registration of
    boundingRatio changed the green r6c_agg gate's values without any
    test failing until the oracle sweep.  Parse every _TEMPLATE.update /
    _RENAME.update literal (plus the initial dict literals) and assert no
    key is registered twice."""
    import ast
    import os
    from collections import Counter

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "moosestack_spark", "sql", "ch_functions.py",
    )
    tree = ast.parse(open(path).read())
    keys = {"_TEMPLATE": Counter(), "_RENAME": Counter()}

    def dict_keys(node):
        return [
            k.value for k in node.keys
            if isinstance(k, ast.Constant) and isinstance(k.value, str)
        ]

    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if (
                    isinstance(tgt, ast.Name)
                    and tgt.id in keys
                    and isinstance(node.value, ast.Dict)
                ):
                    keys[tgt.id].update(dict_keys(node.value))
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "update"
            and isinstance(node.func.value, ast.Name)
            and node.func.value.id in keys
            and node.args
            and isinstance(node.args[0], ast.Dict)
        ):
            keys[node.func.value.id].update(dict_keys(node.args[0]))
    for table, counter in keys.items():
        dupes = sorted(k for k, c in counter.items() if c > 1)
        assert not dupes, f"{table} keys registered more than once: {dupes}"


def test_extract_all_groups_vertical(spark):
    from moosestack_spark.sql.ch_functions import translate_ch_sql

    row = spark.sql(
        translate_ch_sql(
            "SELECT arrayStringConcat(arrayMap(g -> arrayStringConcat(g, ':'), "
            "extractAllGroupsVertical('x=1;y=22;z=333', "
            "'([a-z])=([0-9]+)')), '|') AS eag, "
            "extractAllGroupsVertical('no pairs here!', "
            "'([a-z])=([0-9]+)') AS empty"
        )
    ).collect()[0]
    assert row.eag == "x:1|y:22|z:333"
    assert row.empty == []
    import pytest

    with pytest.raises(ValueError, match="literal pattern"):
        translate_ch_sql("SELECT extractAllGroupsVertical(s, p) FROM t")
    with pytest.raises(ValueError, match="no capture group"):
        translate_ch_sql("SELECT extractAllGroupsVertical(s, 'abc') FROM t")
