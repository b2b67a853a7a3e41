"""Schema-reflection tests mirroring the reference's model zoo
(templates/python-tests/src/ingest/models.py:80-220 BasicTypes /
SimpleArrays / NestedObjects / ArraysOfObjects / DeeplyNestedArrays and
packages/py-moose-lib/tests/test_moose_model.py / test_fixedstring.py)."""

from __future__ import annotations

import datetime as dt
from enum import Enum
from typing import Any, Literal, Optional

import pytest
from pydantic import BaseModel
from pyspark.sql import types as st

from moosestack_spark.datamodel import (
    FixedString,
    Int8,
    Int32,
    Key,
    UInt16,
    UInt64,
    Float32,
    clickhouse_datetime64,
    clickhouse_decimal,
    to_columns,
    to_struct_type,
)
from typing import Annotated


class Baz(str, Enum):
    QUX = "QUX"
    QUUX = "QUUX"


class Bar(BaseModel):
    """The reference's minimum end-to-end model (models.py:52-58)."""

    primary_key: Key[str]
    utc_timestamp: dt.datetime
    baz: Baz
    has_text: bool
    text_length: int


class BasicTypes(BaseModel):
    id: Key[str]
    timestamp: dt.datetime
    string_field: str
    number_field: float
    boolean_field: bool
    optional_string: Optional[str] = None
    nullable_number: Optional[float] = None


class Coordinates(BaseModel):
    lat: float
    lng: float


class Address(BaseModel):
    street: str
    city: str
    coordinates: Coordinates


class NestedObjects(BaseModel):
    id: Key[str]
    address: Address
    tags: list[str]


class DeeplyNested(BaseModel):
    id: Key[str]
    matrix_2d: list[list[float]]
    matrix_3d: list[list[list[float]]]


class SizedTypes(BaseModel):
    i8: Int8
    i32: Int32
    u16: UInt16
    u64: UInt64
    f32: Float32
    dec: clickhouse_decimal(10, 2)
    dt64: clickhouse_datetime64(6)
    fs: Annotated[str, FixedString(4)]
    card: Literal["a", "b"]
    js: Any = None


def test_bar_struct():
    s = to_struct_type(Bar)
    assert [f.name for f in s.fields] == [
        "primary_key",
        "utc_timestamp",
        "baz",
        "has_text",
        "text_length",
    ]
    assert isinstance(s["primary_key"].dataType, st.StringType)
    assert s["primary_key"].metadata.get("primary_key") is True
    assert isinstance(s["utc_timestamp"].dataType, st.TimestampType)
    assert isinstance(s["baz"].dataType, st.StringType)
    assert s["baz"].metadata["enum_values"] == ["QUX", "QUUX"]
    assert isinstance(s["text_length"].dataType, st.LongType)  # int -> Int64


def test_optional_is_nullable():
    s = to_struct_type(BasicTypes)
    assert not s["string_field"].nullable
    assert s["optional_string"].nullable
    assert s["nullable_number"].nullable


def test_nested_structs():
    s = to_struct_type(NestedObjects)
    addr = s["address"].dataType
    assert isinstance(addr, st.StructType)
    assert isinstance(addr["coordinates"].dataType, st.StructType)
    assert isinstance(addr["coordinates"].dataType["lat"].dataType, st.DoubleType)
    assert isinstance(s["tags"].dataType, st.ArrayType)


def test_deep_matrices():
    s = to_struct_type(DeeplyNested)
    m3 = s["matrix_3d"].dataType
    assert m3.simpleString() == "array<array<array<double>>>"


def test_sized_types_widening_and_metadata():
    s = to_struct_type(SizedTypes)
    assert isinstance(s["i8"].dataType, st.ByteType)
    assert isinstance(s["i32"].dataType, st.IntegerType)
    # unsigned widened to next signed size; original type recorded
    assert isinstance(s["u16"].dataType, st.IntegerType)
    assert s["u16"].metadata["ch_type"] == "UInt16"
    assert isinstance(s["u64"].dataType, st.LongType)
    assert s["u64"].metadata["ch_type"] == "UInt64"
    assert isinstance(s["f32"].dataType, st.FloatType)
    assert s["dec"].dataType.simpleString() == "decimal(10,2)"
    assert isinstance(s["dt64"].dataType, st.TimestampType)
    assert s["fs"].metadata["fixed_length"] == 4
    assert s["card"].metadata["low_cardinality"] is True
    assert s["js"].metadata["ch_type"] == "Json"
    assert isinstance(s["js"].dataType, st.StringType)


def test_columns_record_fields():
    cols = {c.name: c for c in to_columns(Bar)}
    assert cols["primary_key"].primary_key
    assert not cols["has_text"].primary_key
    assert cols["text_length"].required


def test_roundtrip_through_spark(spark):
    s = to_struct_type(BasicTypes)
    rows = [
        {
            "id": "a",
            "timestamp": dt.datetime(2024, 1, 1),
            "string_field": "x",
            "number_field": 1.5,
            "boolean_field": True,
            "optional_string": None,
            "nullable_number": 2.5,
        }
    ]
    df = spark.createDataFrame(rows, s)
    back = df.collect()[0]
    assert back.id == "a" and back.optional_string is None and back.nullable_number == 2.5



from moosestack_spark.datamodel import MultiPolygon, Point, Polygon, Ring  # noqa: E402


class GeoModel(BaseModel):
    p: Point
    ring: Ring
    poly: Polygon
    mp: MultiPolygon


def test_geometry_aliases_reflect_to_nested_arrays():
    schema = to_struct_type(GeoModel)
    assert schema["p"].dataType.simpleString() == "array<double>"
    assert schema["ring"].dataType.simpleString() == "array<array<double>>"
    assert schema["poly"].dataType.simpleString() == "array<array<array<double>>>"
    assert schema["mp"].dataType.simpleString() == "array<array<array<array<double>>>>"


class PairModel(BaseModel):
    pair: tuple[str, int]


def test_heterogeneous_tuple_reflects_to_struct():
    schema = to_struct_type(PairModel)
    assert schema["pair"].dataType.simpleString() == "struct<_1:string,_2:bigint>"


# ---------------------------------------------------------------------------
# Exhaustive type-zoo round trip, mirroring the reference's fixture apps
# (templates/python-tests/src/ingest/models.py:80-220: BasicTypes,
# SimpleArrays, NestedObjects, ArraysOfObjects, MixedComplexTypes).
# Model -> StructType -> Spark rows -> parquet -> read -> identical values.
# ---------------------------------------------------------------------------

import datetime as _dt
import enum
from decimal import Decimal as _Dec

from moosestack_spark.datamodel import (
    Int8,
    UInt16,
    clickhouse_decimal,
)


class Color(enum.Enum):
    RED = "red"
    BLUE = "blue"


class Inner(BaseModel):
    a: int
    b: str


class ZooModel(BaseModel):
    s: str
    i8: Int8
    u16: UInt16
    f: float
    flag: bool
    when: _dt.datetime
    day: _dt.date
    dec: clickhouse_decimal(10, 2)
    color: Color
    tags: list[str]
    matrix: list[list[float]]
    kv: dict[str, int]
    nested: Inner
    nested_arr: list[Inner]
    blob: bytes
    point: Point
    maybe: Optional[str] = None


def test_type_zoo_roundtrip_through_parquet(spark, tmp_path):
    schema = to_struct_type(ZooModel)
    row = ZooModel(
        s="x",
        i8=-5,
        u16=60000,
        f=1.25,
        flag=True,
        when=_dt.datetime(2024, 3, 1, 12, 30, 45, 123456),
        day=_dt.date(2024, 3, 1),
        dec=_Dec("12345.67"),
        color=Color.BLUE,
        tags=["a", "b"],
        matrix=[[1.0, 2.0], [3.0]],
        kv={"k1": 1, "k2": 2},
        nested=Inner(a=1, b="in"),
        nested_arr=[Inner(a=2, b="x"), Inner(a=3, b="y")],
        blob=b"\x00\x01\xff",
        point=(1.5, -2.5),
        maybe=None,
    )
    d = row.model_dump()
    d["color"] = row.color.value  # enums store their value (§1.3)
    df = spark.createDataFrame([d], schema)
    path = str(tmp_path / "zoo")
    df.write.parquet(path)
    back = spark.read.schema(schema).parquet(path).collect()[0]
    assert back.s == "x" and back.i8 == -5 and back.u16 == 60000
    assert back.f == 1.25 and back.flag is True
    assert back.when == _dt.datetime(2024, 3, 1, 12, 30, 45, 123456)
    assert back.day == _dt.date(2024, 3, 1)
    assert back.dec == _Dec("12345.67")
    assert back.color == "blue"
    assert back.tags == ["a", "b"] and back.matrix == [[1.0, 2.0], [3.0]]
    assert back.kv == {"k1": 1, "k2": 2}
    assert back.nested.a == 1 and [r.a for r in back.nested_arr] == [2, 3]
    assert bytes(back.blob) == b"\x00\x01\xff"
    assert list(back.point) == [1.5, -2.5]
    assert back.maybe is None
    # metadata carries the CH types for faithful round-trip (SURVEY §7.6)
    assert schema["i8"].metadata.get("ch_type") == "Int8"
    assert schema["u16"].metadata.get("ch_type") == "UInt16"
    assert schema["dec"].metadata.get("ch_type") == "Decimal(10,2)"


# --------------------------------------------------------------------------
# ClickHouseJson typed-path columns (reference data_models.py:597-637)
# (models at module scope: get_type_hints can't resolve function-locals
# under postponed annotations)
# --------------------------------------------------------------------------

from typing import Annotated as _Annotated

from pydantic import ConfigDict as _ConfigDict

from moosestack_spark.datamodel import JSON_DYNAMIC_FIELD, ClickHouseJson


class _JsonPayload(BaseModel):
    model_config = _ConfigDict(extra="allow")
    kind: str
    score: int


class _JsonDoc(BaseModel):
    id: int
    payload: _Annotated[
        _JsonPayload,
        ClickHouseJson(skip_paths=("secret",), skip_regexps=(r"^tmp_",),
                       max_dynamic_paths=32),
    ]


def test_clickhouse_json_reflects_typed_paths_plus_dynamic():
    from pyspark.sql import types as st

    from moosestack_spark.datamodel.reflection import to_columns

    cols = {c.name: c for c in to_columns(_JsonDoc)}
    p = cols["payload"]
    assert isinstance(p.data_type, st.StructType)
    assert [f.name for f in p.data_type.fields] == ["kind", "score", JSON_DYNAMIC_FIELD]
    assert p.data_type[JSON_DYNAMIC_FIELD].dataType == st.StringType()
    assert p.annotations["ch_type"] == "Json"
    assert p.annotations["json_typed_paths"] == ["kind", "score"]
    assert p.annotations["json_skip_paths"] == ["secret"]
    assert p.annotations["json_skip_regexps"] == [r"^tmp_"]
    assert p.annotations["json_max_dynamic_paths"] == 32


class _JsonNoExtra(BaseModel):
    kind: str


class _JsonBadModel1(BaseModel):
    p: _Annotated[_JsonNoExtra, ClickHouseJson()]


class _JsonWithDefault(BaseModel):
    model_config = _ConfigDict(extra="allow")
    kind: str = "x"


class _JsonBadModel2(BaseModel):
    p: _Annotated[_JsonWithDefault, ClickHouseJson()]


def test_clickhouse_json_enforces_reference_rules():
    import pytest

    from moosestack_spark.datamodel.reflection import to_columns

    with pytest.raises(ValueError, match="extra='allow'"):
        to_columns(_JsonBadModel1)
    with pytest.raises(ValueError, match="Default in inner field"):
        to_columns(_JsonBadModel2)


class _JsonDoc2(BaseModel):
    id: int
    payload: _Annotated[
        _JsonPayload,
        ClickHouseJson(skip_paths=("secret",), skip_regexps=(r"^tmp_",)),
    ]


def test_clickhouse_json_insert_roundtrip(spark, tmp_path):
    """Insert with extras: typed paths land as native struct fields, extras
    in the __dynamic remainder (sorted-key JSON), skip paths/regexps never
    stored."""
    import json

    from moosestack_spark.catalog.table import OlapTable

    t = OlapTable("jdocs", _JsonDoc2, spark, str(tmp_path / "wh"))
    res = t.insert(
        [
            {"id": 1, "payload": {"kind": "a", "score": 3, "city": "Oslo",
                                  "secret": "no", "tmp_x": 1, "zz": True}},
            {"id": 2, "payload": {"kind": "b", "score": 5}},
        ]
    )
    assert res.inserted == 2
    rows = {r.id: r for r in t.read().collect()}
    p1 = rows[1].payload
    assert p1.kind == "a" and p1.score == 3
    dyn = json.loads(p1[JSON_DYNAMIC_FIELD])
    assert dyn == {"city": "Oslo", "zz": True}  # skips dropped, typed split out
    assert rows[2].payload[JSON_DYNAMIC_FIELD] is None
