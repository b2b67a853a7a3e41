"""sql template tag: safe SQL composition with typed parameter binding.

Port target: packages/ts-moose-lib/src/sqlHelpers.ts —
- class Sql (:137-227): nested fragments, Column -> quoted identifier,
  OlapTable -> `db`.`table`, values -> typed placeholders
- toQuery (:267-286): yields (query, {p0: v0, ...})
- type inference Int/Float/Bool/DateTime/String (:338-370)
- agg-state column auto-rewrite fnMerge(col) (:195-211) — with finished-value
  MV storage (SURVEY §7) the rewrite is a plain column read, performed here
  by emitting just the quoted identifier.

Python has no template literals; ``sql(...)`` takes an f-string-like varargs
of fragments and values, or use ``sql.fmt("... {x} ...", x=...)``.

Execution: ``run(spark, q)`` uses spark.sql(query, args=params) — Spark's
native parameterized SQL, injection-safe.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass
from typing import Any, Union

from pyspark.sql import DataFrame, SparkSession


def quote_ident(name: str) -> str:
    """Backtick quoting (sqlHelpers.ts:11-13; same rule in Spark SQL)."""
    return "`" + name.replace("`", "``") + "`"


@dataclass(frozen=True)
class ColumnRef:
    """A typed column reference interpolating to a quoted identifier."""

    name: str
    # set for aggregate-state columns; interpolation is STILL a plain read
    # (finished-value storage), recorded for parity with sqlHelpers.ts:195
    aggregate_function: str | None = None

    def __sql__(self) -> str:
        return quote_ident(self.name)


@dataclass(frozen=True)
class TableRef:
    """OlapTable reference -> `db`.`table` (sqlHelpers.ts:160-170)."""

    name: str
    database: str | None = None

    def __sql__(self) -> str:
        if self.database:
            return f"{quote_ident(self.database)}.{quote_ident(self.name)}"
        return quote_ident(self.name)


class Sql:
    """A composed SQL fragment: text pieces + bound values."""

    def __init__(self, parts: list[str], values: list[Any]):
        assert len(parts) == len(values) + 1
        self.parts = parts
        self.values = values

    def to_query(self, param_prefix: str = "p") -> tuple[str, dict[str, Any]]:
        """(query with :pN placeholders, {pN: value}) (sqlHelpers.ts:267-286)."""
        out: list[str] = []
        params: dict[str, Any] = {}
        for i, part in enumerate(self.parts):
            out.append(part)
            if i < len(self.values):
                key = f"{param_prefix}{i}"
                out.append(f":{key}")
                params[key] = self.values[i]
        return "".join(out), params

    def __repr__(self) -> str:
        q, p = self.to_query()
        return f"Sql({q!r}, {p!r})"


Fragment = Union[str, Sql, ColumnRef, TableRef]


@dataclass(frozen=True)
class Val:
    """Explicit bind-parameter wrapper.

    TS template literals make the text/value boundary syntactic
    (sqlHelpers.ts:137); Python varargs cannot, so STRING values must be
    wrapped: sql("... = ", val("x")).  Non-str Python values (int/float/
    bool/datetime/list) bind without wrapping.
    """

    value: Any


def val(v: Any) -> Val:
    return Val(v)


def sql(*pieces: Any) -> Sql:
    """Compose a Sql from alternating fragments and values.

    - str / ColumnRef / TableRef / Sql pieces are treated as SQL text
      (nested fragments merge their bindings, sqlHelpers.ts:176-190)
    - val(x) and any non-str value become typed bind parameters
    """
    parts: list[str] = [""]
    values: list[Any] = []

    def push_text(text: str) -> None:
        parts[-1] = parts[-1] + text

    for piece in pieces:
        if isinstance(piece, str):
            push_text(piece)
        elif isinstance(piece, (ColumnRef, TableRef)):
            push_text(piece.__sql__())
        elif isinstance(piece, Sql):
            # merge nested fragment
            for j, sub in enumerate(piece.parts):
                push_text(sub)
                if j < len(piece.values):
                    values.append(piece.values[j])
                    parts.append("")
        elif isinstance(piece, Val):
            values.append(_check_bindable(piece.value))
            parts.append("")
        else:
            values.append(_check_bindable(piece))
            parts.append("")
    return Sql(parts, values)


def _check_bindable(v: Any) -> Any:
    """Type inference boundary (sqlHelpers.ts:338-370): supported parameter
    types are int/float/bool/str/datetime/date/None and flat lists."""
    if v is None or isinstance(v, (int, float, bool, str, dt.datetime, dt.date)):
        return v
    if isinstance(v, (list, tuple)) and all(
        isinstance(x, (int, float, bool, str)) for x in v
    ):
        return list(v)
    raise TypeError(f"value {v!r} ({type(v).__name__}) cannot be bound as a SQL parameter")


def run(spark: SparkSession, q: Sql) -> DataFrame:
    """Execute with native parameterized SQL (injection-safe)."""
    query, params = q.to_query()
    return spark.sql(query, args=params)
