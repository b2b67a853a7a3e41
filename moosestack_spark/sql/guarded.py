"""Guarded read-only SQL entry point — MCP `query_olap` parity.

Port target: apps/framework-cli/src/mcp/tools/query_olap.rs:19-80 —
statement whitelist (SELECT / WITH..SELECT / SHOW / DESCRIBE / EXPLAIN,
single statement only; the Rust side validates with sqlparser), auto-LIMIT
with default 100 and hard max 1000 (query_olap.rs:19-21).

Spark mapping: validate the statement shape, then `spark.sql(text)` with a
`.limit(n)` cap composed on top — the cap clamps user LIMITs too (LIMIT 5000
in the text still returns <= max).  EXPLAIN is re-checked against the inner
statement so `EXPLAIN INSERT ...` cannot smuggle DML.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

DEFAULT_LIMIT = 100  # query_olap.rs:19
MAX_LIMIT = 1000  # query_olap.rs:21

_READ_STARTERS = ("SELECT", "WITH", "SHOW", "DESCRIBE", "DESC", "EXPLAIN", "TABLE")
_ROW_RETURNING = ("SELECT", "WITH", "TABLE")


def _first_keyword(text: str) -> str:
    m = re.match(r"\s*([A-Za-z]+)", text)
    return m.group(1).upper() if m else ""


def _strip_explain(text: str) -> str:
    return re.sub(
        r"^\s*EXPLAIN\s+(EXTENDED\s+|FORMATTED\s+|CODEGEN\s+|COST\s+)?",
        "",
        text,
        flags=re.IGNORECASE,
    )


def _assert_parses_as_query(spark: SparkSession, text: str) -> None:
    """Grammar-level read-only check via ParserInterface.parseQuery.

    The first-keyword whitelist alone is bypassable: Spark's grammar allows a
    CTE list before DML (``ctes? dmlStatementNoWith``), so
    ``WITH t AS (SELECT 1) INSERT INTO dest SELECT * FROM t`` starts with the
    whitelisted WITH yet executes an INSERT.  ``parseQuery`` (public parser
    API since Spark 3.3) accepts only the query production and throws a
    ParseException for INSERT/UPDATE/DELETE/MERGE in any position, matching
    the reference's sqlparser statement-type validation (query_olap.rs:19-80).
    """
    parser = spark._jsparkSession.sessionState().sqlParser()
    try:
        parser.parseQuery(text)
    except Exception as exc:  # py4j wraps ParseException
        raise PermissionError(
            f"statement does not parse as a read-only query: {exc}"
        ) from None


def validate_read_only(sql_text: str, spark: Optional[SparkSession] = None) -> str:
    """Return the normalized statement or raise PermissionError.

    With ``spark`` supplied, row-returning statements are additionally
    grammar-checked with ``parseQuery`` (see _assert_parses_as_query); without
    it only the textual checks run.
    """
    text = sql_text.strip()
    while text.endswith(";"):
        text = text[:-1].rstrip()
    if ";" in text:
        raise PermissionError("multiple statements are not allowed")
    kw = _first_keyword(text)
    if kw not in _READ_STARTERS:
        raise PermissionError(
            f"statement type {kw or '<empty>'!r} is not allowed; "
            f"read-only statements only: {_READ_STARTERS}"
        )
    if kw == "EXPLAIN":
        inner = _strip_explain(text)
        inner_kw = _first_keyword(inner)
        if inner_kw not in _READ_STARTERS:
            raise PermissionError(f"EXPLAIN over {inner_kw!r} is not allowed")
        if spark is not None and inner_kw in _ROW_RETURNING:
            _assert_parses_as_query(spark, inner)
    elif spark is not None and kw in _ROW_RETURNING:
        _assert_parses_as_query(spark, text)
    return text


def query_olap(
    spark: SparkSession, sql_text: str, limit: Optional[int] = None
) -> DataFrame:
    """Execute a read-only statement with the reference's row cap."""
    text = validate_read_only(sql_text, spark)
    df = spark.sql(text)
    if _first_keyword(text) in _ROW_RETURNING:
        eff = min(limit if limit is not None else DEFAULT_LIMIT, MAX_LIMIT)
        df = df.limit(eff)
    return df
