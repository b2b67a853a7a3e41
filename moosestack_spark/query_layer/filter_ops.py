"""Filter-operator compiler with the reference's exact semantics.

Port target: packages/ts-moose-lib/src/query-layer/sql-utils.ts:55-215
(`filter(col, op, value)` plus and/or/not combinators).  Key behaviors
preserved exactly:

- value === undefined/null  => the clause is SKIPPED (returns no condition),
  so optional request params simply drop out of the WHERE (sql-utils.ts:60-66)
- `in` with an empty list   => literal FALSE  (`1 = 0`, sql-utils.ts:118-121)
- `notIn` with empty list   => literal TRUE   (`1 = 1`, sql-utils.ts:128-131)
- `between` takes a (lo, hi) pair
- and/or drop skipped fragments; OR is parenthesized (here: Column tree, so
  precedence is structural)

Compiles to pyspark Column expressions (JVM-side, codegen-friendly) rather
than SQL strings — predicates stay pushable into parquet scans.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from typing import Any, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

FilterSpec = tuple[str, str, Any]  # (column, op, value)

_OPS = frozenset(
    {
        "eq",
        "ne",
        "gt",
        "gte",
        "lt",
        "lte",
        "like",
        "ilike",
        "in",
        "notIn",
        "between",
        "isNull",
        "isNotNull",
    }
)


def compile_filter(column: str, op: str, value: Any = None) -> Optional[Column]:
    """One filter clause -> Column, or None when the clause is skipped."""
    if op not in _OPS:
        raise ValueError(f"unknown filter op {op!r}; supported: {sorted(_OPS)}")
    c = F.col(column)
    if op == "isNull":
        return c.isNull()
    if op == "isNotNull":
        return c.isNotNull()
    if value is None:
        return None  # skip-on-undefined (sql-utils.ts:60-66)
    if op == "eq":
        return c == F.lit(value)
    if op == "ne":
        return c != F.lit(value)
    if op == "gt":
        return c > F.lit(value)
    if op == "gte":
        return c >= F.lit(value)
    if op == "lt":
        return c < F.lit(value)
    if op == "lte":
        return c <= F.lit(value)
    if op == "like":
        return c.like(value)
    if op == "ilike":
        return c.ilike(value)
    if op == "in":
        vals = list(value)
        return F.lit(False) if not vals else c.isin(vals)
    if op == "notIn":
        vals = list(value)
        return F.lit(True) if not vals else ~c.isin(vals)
    if op == "between":
        lo, hi = value
        return c.between(F.lit(lo), F.lit(hi))
    raise AssertionError("unreachable")


def and_(conds: Iterable[Optional[Column]]) -> Optional[Column]:
    """AND-fold, dropping skipped (None) fragments (sql-utils.ts:190-199)."""
    out: Optional[Column] = None
    for cond in conds:
        if cond is None:
            continue
        out = cond if out is None else (out & cond)
    return out


def or_(conds: Iterable[Optional[Column]]) -> Optional[Column]:
    """OR-fold, dropping skipped fragments (sql-utils.ts:201-210)."""
    out: Optional[Column] = None
    for cond in conds:
        if cond is None:
            continue
        out = cond if out is None else (out | cond)
    return out


def not_(cond: Optional[Column]) -> Optional[Column]:
    return None if cond is None else ~cond


def compile_filters(specs: Sequence[FilterSpec]) -> Column:
    """AND of clauses; an all-skipped list compiles to TRUE (empty WHERE)."""
    cond = and_(compile_filter(col, op, val) for col, op, val in specs)
    return F.lit(True) if cond is None else cond
