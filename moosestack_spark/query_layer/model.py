"""Semantic query layer: the defineQueryModel port, compiled to DataFrame ops.

Port target: packages/ts-moose-lib/src/query-layer/query-model.ts —
- config surface: dimensions / metrics / detail columns / joins / filters /
  sortable / pagination caps (:143-236)
- named lookup joins {table, leftKey, rightKey, type?=LEFT} or arbitrary
  `on`; join-column references {join: "x", column: "c"} (:193-205, :683-708,
  :434-447)
- resolveQuerySpec: requested dims+metrics -> SELECT, dims -> GROUP BY
  (:710-749, :751-778); detail mode (columns, no metrics) -> plain select
- HAVING via metric-named filters (:474-494, :579-624)
- sortable allowlist; order by metric alias; dims not selected are skipped
  from ORDER BY (:626-681)
- pagination: limit/page vs offset mutually exclusive; default limit 100,
  maxLimit 1000 (:783-794, :394)

Compilation is entirely to DataFrame operations (groupBy/agg/filter/join)
— Catalyst owns optimization, and at scale the aggregation is the only
mandatory shuffle (joins broadcast when small, HAVING is a post-agg filter
on already-reduced rows).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from moosestack_spark.query_layer.filter_ops import compile_filter
from moosestack_spark.query_layer.pagination import DEFAULT_LIMIT, MAX_LIMIT, clamp_limit


@dataclass
class Join:
    """Named lookup join (query-model.ts:193-205)."""

    table: DataFrame
    left_key: Optional[str] = None
    right_key: Optional[str] = None
    how: str = "left"  # default LEFT (query-model.ts:699)
    on: Optional[Column] = None  # arbitrary fragment alternative

    def condition(self, left: DataFrame) -> Column:
        if self.on is not None:
            return self.on
        if not (self.left_key and self.right_key):
            raise ValueError("join needs left_key/right_key or on")
        return left[self.left_key] == self.table[self.right_key]


@dataclass
class JoinColumn:
    """{join: 'cust', column: 'c_mktsegment'} (query-model.ts:434-447)."""

    join: str
    column: str


ExprLike = Union[str, Column, JoinColumn]


@dataclass
class QueryRequest:
    """The consumer-facing request shape."""

    dimensions: Sequence[str] = ()
    metrics: Sequence[str] = ()
    columns: Sequence[str] = ()  # detail mode
    filters: Sequence[tuple[str, str, Any]] = ()
    order_by: Sequence[Union[str, tuple[str, str]]] = ()
    limit: Optional[int] = None
    page: Optional[int] = None
    offset: Optional[int] = None


class QueryModel:
    """defineQueryModel equivalent."""

    def __init__(
        self,
        source: DataFrame,
        dimensions: dict[str, ExprLike],
        metrics: dict[str, Column],
        columns: Optional[dict[str, ExprLike]] = None,
        joins: Optional[dict[str, Join]] = None,
        sortable: Optional[Sequence[str]] = None,
        default_limit: int = DEFAULT_LIMIT,
        max_limit: int = MAX_LIMIT,
    ):
        self.source = source
        self.dimensions = dimensions
        self.metrics = metrics
        self.columns = columns or {}
        self.joins = joins or {}
        self.sortable = set(sortable) if sortable is not None else None
        self.default_limit = default_limit
        self.max_limit = max_limit

    # -- helpers -----------------------------------------------------------

    def _resolve(self, expr: ExprLike) -> Column:
        if isinstance(expr, JoinColumn):
            if expr.join not in self.joins:
                raise KeyError(f"unknown join {expr.join!r}")
            return self.joins[expr.join].table[expr.column]
        if isinstance(expr, str):
            return F.col(expr)
        return expr

    def _base_frame(self, needed_joins: set[str]) -> DataFrame:
        out = self.source
        for name in needed_joins:
            j = self.joins[name]
            out = out.join(j.table, j.condition(self.source), j.how.lower())
        return out

    def _joins_needed(self, exprs: Sequence[ExprLike]) -> set[str]:
        need: set[str] = set()
        for e in exprs:
            if isinstance(e, JoinColumn):
                need.add(e.join)
        return need

    # -- the compiler (resolveQuerySpec port) ------------------------------

    def query(self, request: QueryRequest) -> DataFrame:
        if request.page is not None and request.offset is not None:
            # limit+page mutually exclusive with offset (query-model.ts:783)
            raise ValueError("page and offset are mutually exclusive")

        for d in request.dimensions:
            if d not in self.dimensions:
                raise KeyError(f"unknown dimension {d!r}")
        for m in request.metrics:
            if m not in self.metrics:
                raise KeyError(f"unknown metric {m!r}")
        for c in request.columns:
            if c not in self.columns:
                raise KeyError(f"unknown column {c!r}")

        detail_mode = bool(request.columns) and not request.metrics

        # referenced join tables — filters count too: a WHERE on a
        # join-backed dimension that is not in the SELECT still needs its
        # join in the frame (otherwise the predicate references an unjoined
        # table and analysis fails)
        used_exprs: list[ExprLike] = (
            [self.dimensions[d] for d in request.dimensions]
            + [self.columns[c] for c in request.columns]
            + [
                self.dimensions[f[0]]
                for f in request.filters
                if f[0] in self.dimensions and f[0] not in self.metrics
            ]
            + [
                self.columns[f[0]]
                for f in request.filters
                if f[0] in self.columns and f[0] not in self.metrics
            ]
        )
        frame = self._base_frame(self._joins_needed(used_exprs))

        # split filters into WHERE (non-metric) and HAVING (metric alias)
        where_specs = [f for f in request.filters if f[0] not in self.metrics]
        having_specs = [f for f in request.filters if f[0] in self.metrics]

        for colname, op, value in where_specs:
            target: ExprLike
            if colname in self.dimensions:
                target = self.dimensions[colname]
            elif colname in self.columns:
                target = self.columns[colname]
            else:
                target = colname
            resolved = self._resolve(target)
            cond = _filter_on(resolved, op, value)
            if cond is not None:
                frame = frame.filter(cond)

        if detail_mode:
            out = frame.select(
                *[self._resolve(self.columns[c]).alias(c) for c in request.columns]
            )
        else:
            dims = [self._resolve(self.dimensions[d]).alias(d) for d in request.dimensions]
            aggs = [self.metrics[m].alias(m) for m in request.metrics]
            if not aggs:
                out = frame.select(*dims).distinct()
            elif dims:
                out = frame.groupBy(*dims).agg(*aggs)
            else:
                out = frame.agg(*aggs)
            # HAVING on metric aliases (query-model.ts:474-494)
            for colname, op, value in having_specs:
                cond = _filter_on(F.col(colname), op, value)
                if cond is not None:
                    out = out.filter(cond)

        # ORDER BY: sortable allowlist; skip dims not in the select list
        selected = set(request.dimensions) | set(request.metrics) | set(request.columns)
        order_cols: list[Column] = []
        for spec in request.order_by:
            name, direction = (spec, "asc") if isinstance(spec, str) else spec
            if self.sortable is not None and name not in self.sortable:
                raise ValueError(f"column {name!r} is not sortable")
            if name not in selected:
                continue  # skipped, query-model.ts:626-681
            c = F.col(name)
            order_cols.append(c.desc() if direction.lower() == "desc" else c.asc())
        if order_cols:
            out = out.orderBy(*order_cols)

        # pagination (query-model.ts:783-794)
        n = clamp_limit(
            request.limit if request.limit is not None else self.default_limit,
            self.max_limit,
        )
        if request.page is not None:
            out = out.offset(n * request.page)
        elif request.offset:
            out = out.offset(request.offset)
        return out.limit(n)


def _filter_on(target: Column, op: str, value: Any) -> Optional[Column]:
    """filter-op semantics applied to an arbitrary resolved Column."""
    import pyspark.sql.functions as F  # local alias

    if op == "isNull":
        return target.isNull()
    if op == "isNotNull":
        return target.isNotNull()
    if value is None:
        return None  # skip-on-undefined
    if op == "eq":
        return target == F.lit(value)
    if op == "ne":
        return target != F.lit(value)
    if op == "gt":
        return target > F.lit(value)
    if op == "gte":
        return target >= F.lit(value)
    if op == "lt":
        return target < F.lit(value)
    if op == "lte":
        return target <= F.lit(value)
    if op == "like":
        return target.like(value)
    if op == "ilike":
        return target.ilike(value)
    if op == "in":
        vals = list(value)
        return F.lit(False) if not vals else target.isin(vals)
    if op == "notIn":
        vals = list(value)
        return F.lit(True) if not vals else ~target.isin(vals)
    if op == "between":
        lo, hi = value
        return target.between(F.lit(lo), F.lit(hi))
    raise ValueError(f"unknown filter op {op!r}")
