"""Python Query() builder — fluent select/where/order_by/limit compiling to
a DataFrame (the reference compiles to ClickHouse SQL via sqlglot).

Port target: packages/py-moose-lib/moose_lib/query_builder.py —
- Query().select(*cols) columns-only (:126-134)
- .where(predicate) (:136-142)
- ColumnRef._binary_op predicates eq ne lt le gt ge in_ is_null (:55-108)
- and_/or_ combinators (:188-211)
- .order_by(col | (col, 'asc'|'desc'), ...) (:144-175)
- .limit(n) (:183-186)

Usage::

    q = (Query(table_df)
         .select("a", "b")
         .where(and_(col("a").eq(1), col("b").gt(2.5)))
         .order_by(("b", "desc"), "a")
         .limit(10))
    df = q.df()
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Union

from pyspark.sql import Column as SparkColumn
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Predicate:
    expr: SparkColumn


class ColRef:
    """Predicate-building column handle (query_builder.py:55-108)."""

    def __init__(self, name: str):
        self.name = name
        self._c = F.col(name)

    def eq(self, v: Any) -> Predicate:
        return Predicate(self._c == F.lit(v))

    def ne(self, v: Any) -> Predicate:
        return Predicate(self._c != F.lit(v))

    def lt(self, v: Any) -> Predicate:
        return Predicate(self._c < F.lit(v))

    def le(self, v: Any) -> Predicate:
        return Predicate(self._c <= F.lit(v))

    def gt(self, v: Any) -> Predicate:
        return Predicate(self._c > F.lit(v))

    def ge(self, v: Any) -> Predicate:
        return Predicate(self._c >= F.lit(v))

    def in_(self, vs: list) -> Predicate:
        return Predicate(F.lit(False) if not vs else self._c.isin(vs))

    def is_null(self) -> Predicate:
        return Predicate(self._c.isNull())

    def is_not_null(self) -> Predicate:
        return Predicate(self._c.isNotNull())

    def like(self, pat: str) -> Predicate:
        return Predicate(self._c.like(pat))


def col(name: str) -> ColRef:
    return ColRef(name)


def and_(*ps: Predicate) -> Predicate:
    """Fold over predicates (query_builder.py:188-199)."""
    if not ps:
        return Predicate(F.lit(True))
    out = ps[0].expr
    for p in ps[1:]:
        out = out & p.expr
    return Predicate(out)


def or_(*ps: Predicate) -> Predicate:
    """(query_builder.py:201-211)"""
    if not ps:
        return Predicate(F.lit(False))
    out = ps[0].expr
    for p in ps[1:]:
        out = out | p.expr
    return Predicate(out)


OrderSpec = Union[str, tuple[str, str]]


class Query:
    """Immutable fluent builder; .df() yields the DataFrame plan."""

    def __init__(self, source: DataFrame):
        self._source = source
        self._select: Optional[list[str]] = None
        self._where: Optional[SparkColumn] = None
        self._order: list[tuple[str, str]] = []
        self._limit: Optional[int] = None

    def _copy(self) -> "Query":
        q = Query(self._source)
        q._select = list(self._select) if self._select else None
        q._where = self._where
        q._order = list(self._order)
        q._limit = self._limit
        return q

    def select(self, *cols: str) -> "Query":
        """Columns only, as in the reference (query_builder.py:126-134)."""
        q = self._copy()
        q._select = list(cols)
        return q

    def where(self, pred: Predicate) -> "Query":
        q = self._copy()
        q._where = pred.expr if q._where is None else (q._where & pred.expr)
        return q

    def order_by(self, *specs: OrderSpec) -> "Query":
        q = self._copy()
        for s in specs:
            if isinstance(s, str):
                q._order.append((s, "asc"))
            else:
                name, direction = s
                d = direction.lower()
                if d not in ("asc", "desc"):
                    raise ValueError(f"order direction must be asc/desc, got {direction!r}")
                q._order.append((name, d))
        return q

    def limit(self, n: int) -> "Query":
        if n <= 0:
            raise ValueError("limit must be positive")
        q = self._copy()
        q._limit = n
        return q

    def df(self) -> DataFrame:
        out = self._source
        if self._where is not None:
            out = out.filter(self._where)
        if self._select:
            out = out.select(*self._select)
        if self._order:
            out = out.orderBy(
                *[F.col(n).asc() if d == "asc" else F.col(n).desc() for n, d in self._order]
            )
        if self._limit is not None:
            out = out.limit(self._limit)
        return out
