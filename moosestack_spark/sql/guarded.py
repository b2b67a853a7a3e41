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


def validate_read_only(sql_text: str) -> str:
    """Return the normalized statement or raise PermissionError."""
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
        # strip EXPLAIN [EXTENDED|FORMATTED|CODEGEN|COST] and re-check
        inner = re.sub(
            r"^\s*EXPLAIN\s+(EXTENDED\s+|FORMATTED\s+|CODEGEN\s+|COST\s+)?",
            "",
            text,
            flags=re.IGNORECASE,
        )
        inner_kw = _first_keyword(inner)
        if inner_kw not in _READ_STARTERS:
            raise PermissionError(f"EXPLAIN over {inner_kw!r} is not allowed")
    return text


def query_olap(
    spark: SparkSession, sql_text: str, limit: Optional[int] = None
) -> DataFrame:
    """Execute a read-only statement with the reference's row cap."""
    text = validate_read_only(sql_text)
    df = spark.sql(text)
    if _first_keyword(text) in _ROW_RETURNING:
        eff = min(limit if limit is not None else DEFAULT_LIMIT, MAX_LIMIT)
        df = df.limit(eff)
    return df
