"""ClickHouse-flavored type aliases and column annotations.

Port target: packages/py-moose-lib/moose_lib/data_models.py —
- sized int aliases Int8..UInt64 (:30-37)
- Key[T] primary-key marker (:26)
- clickhouse_decimal / clickhouse_datetime64 (:167-177)
- FixedString (:180-194)
- ClickhouseDefault (:61-67), ClickHouseMaterialized (:80-121),
  ClickHouseAlias (:124-156), ClickHouseTTL (:70-72), ClickHouseCodec (:75-77)
- aggregated / AggregateFunction (:205-228), simple_aggregated /
  SimpleAggregateFunction (:230-266)

Everything is expressed as typing.Annotated metadata over plain Python
types, exactly like the reference, so user models are ordinary Pydantic
classes.  The reflection layer (reflection.py) consumes these markers.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Annotated, Any, Literal, TypeVar, Union

T = TypeVar("T")


# ---------------------------------------------------------------------------
# markers carried in Annotated[...] metadata
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class _SizedInt:
    bits: int
    signed: bool


@dataclass(frozen=True)
class _SizedFloat:
    bits: int


@dataclass(frozen=True)
class _DecimalMarker:
    precision: int
    scale: int


@dataclass(frozen=True)
class _DateTime64Marker:
    precision: int


@dataclass(frozen=True)
class FixedString:
    """FixedString(n) — string with an exact byte length, enforced on insert
    (data_models.py:180-194)."""

    length: int


@dataclass(frozen=True)
class _KeyMarker:
    pass


@dataclass(frozen=True)
class _LowCardinalityMarker:
    pass


@dataclass(frozen=True)
class ClickhouseDefault:
    """Default SQL expression applied when the field is absent on insert
    (data_models.py:61-67)."""

    expression: str


@dataclass(frozen=True)
class ClickHouseMaterialized:
    """Computed AND stored at insert time (data_models.py:80-121).
    Spark: computed via withColumn in the insert path."""

    expression: str


@dataclass(frozen=True)
class ClickHouseAlias:
    """Computed at SELECT time, never stored (data_models.py:124-156).
    Spark: view-level computed column."""

    expression: str


@dataclass(frozen=True)
class ClickHouseTTL:
    """Column/table TTL expression (data_models.py:70-72) — applied by the
    retention job, not at query time."""

    expression: str


@dataclass(frozen=True)
class ClickHouseCodec:
    """Compression codec hint (data_models.py:75-77).  Parquet handles
    encoding; recorded in metadata as documentation."""

    codec: str


@dataclass(frozen=True)
class AggregateFunction:
    """AggregateFunction(fn, arg_types) column (data_models.py:205-228).

    The reference stores ClickHouse partial-aggregate state; our engine
    stores composable finished values (SURVEY.md §7 hard part 1) — the
    marker records fn + argument types so MVs know how to maintain and
    queries know the '-Merge' read is a plain column read."""

    function: str
    arg_types: tuple = ()


@dataclass(frozen=True)
class SimpleAggregateFunction:
    """SimpleAggregateFunction(fn, T) (data_models.py:230-266): finished
    values re-aggregated with fn at merge — identical storage here."""

    function: str


@dataclass(frozen=True)
class ClickHouseJson:
    """ClickHouse `Json` dynamic-column options (data_models.py:160-165,
    :597-637): attach to a Pydantic model whose declared fields become the
    TYPED PATHS (stored as native struct columns) while any extra request
    fields land in the dynamic remainder (`__dynamic` JSON-text field),
    minus skip_paths/skip_regexps.  The model must set
    model_config = ConfigDict(extra='allow') and its fields must not carry
    defaults — the same rules the reference enforces."""

    max_dynamic_paths: int | None = None
    max_dynamic_types: int | None = None
    skip_paths: tuple[str, ...] = ()
    skip_regexps: tuple[str, ...] = ()


# name of the struct field that carries the non-typed JSON remainder
JSON_DYNAMIC_FIELD = "__dynamic"


@dataclass(frozen=True)
class JWTMarker:
    """JWT[T] — value injected from the request JWT (data_models.py:27)."""


# ---------------------------------------------------------------------------
# public aliases (the user-facing vocabulary, mirroring data_models.py:30-41)
# ---------------------------------------------------------------------------

Int8 = Annotated[int, _SizedInt(8, True)]
Int16 = Annotated[int, _SizedInt(16, True)]
Int32 = Annotated[int, _SizedInt(32, True)]
Int64 = Annotated[int, _SizedInt(64, True)]
UInt8 = Annotated[int, _SizedInt(8, False)]
UInt16 = Annotated[int, _SizedInt(16, False)]
UInt32 = Annotated[int, _SizedInt(32, False)]
UInt64 = Annotated[int, _SizedInt(64, False)]
Float32 = Annotated[float, _SizedFloat(32)]
Float64 = Annotated[float, _SizedFloat(64)]

# Key[T]: primary-key marker, part of the sort key (data_models.py:26)
Key = Annotated[T, _KeyMarker()]

# LowCardinality[T] — dictionary-encoded; automatic in Parquet, kept as doc
LowCardinality = Annotated[T, _LowCardinalityMarker()]

JWT = Annotated[T, JWTMarker()]


def clickhouse_decimal(precision: int, scale: int) -> Any:
    """Decimal(p,s) field type (data_models.py:167-168)."""
    from decimal import Decimal

    return Annotated[Decimal, _DecimalMarker(precision, scale)]


def clickhouse_datetime64(precision: int) -> Any:
    """DateTime64(p) field type (data_models.py:171-177).  Spark timestamps
    are microsecond; p>6 is accepted and truncated (documented)."""
    from datetime import datetime

    return Annotated[datetime, _DateTime64Marker(precision)]


def aggregated(result_type: Any, function: str, arg_types: list | None = None) -> Any:
    """aggregated(T, fn, args) -> column holding an incrementally-maintained
    aggregate (data_models.py:205-228)."""
    return Annotated[result_type, AggregateFunction(function, tuple(arg_types or ()))]


def simple_aggregated(result_type: Any, function: str) -> Any:
    """simple_aggregated(T, fn) (data_models.py:230-266)."""
    return Annotated[result_type, SimpleAggregateFunction(function)]


# Literal[...] of strings == LowCardinality in the reference (:638-640)
__all__ = [
    "Int8",
    "Int16",
    "Int32",
    "Int64",
    "UInt8",
    "UInt16",
    "UInt32",
    "UInt64",
    "Float32",
    "Float64",
    "Key",
    "JWT",
    "LowCardinality",
    "FixedString",
    "ClickhouseDefault",
    "ClickHouseMaterialized",
    "ClickHouseAlias",
    "ClickHouseTTL",
    "Point",
    "Ring",
    "LineString",
    "MultiLineString",
    "Polygon",
    "MultiPolygon",
    "ClickHouseCodec",
    "ClickHouseJson",
    "JSON_DYNAMIC_FIELD",
    "AggregateFunction",
    "SimpleAggregateFunction",
    "clickhouse_decimal",
    "clickhouse_datetime64",
    "aggregated",
    "simple_aggregated",
    "Literal",
    "Union",
]


# --------------------------------------------------------------------------
# Geometry aliases (data_models.py:197-202, validation :428-457): ClickHouse
# geo types are plain nested Float64 containers; Spark has no native geo
# type so they reflect to nested array<double> (a homogeneous tuple maps to
# a fixed-length array).
# --------------------------------------------------------------------------

Point = tuple[float, float]
Ring = list[Point]
LineString = list[Point]
MultiLineString = list[LineString]
Polygon = list[Ring]
MultiPolygon = list[Polygon]
