"""Typed data model: ClickHouse-flavored type aliases + Pydantic->StructType
reflection (SURVEY.md §1.2-§1.3).
"""

from moosestack_spark.datamodel.types import (  # noqa: F401
    AggregateFunction,
    ClickHouseAlias,
    ClickHouseCodec,
    ClickHouseJson,
    JSON_DYNAMIC_FIELD,
    ClickHouseMaterialized,
    ClickHouseTTL,
    LineString,
    MultiLineString,
    MultiPolygon,
    Point,
    Polygon,
    Ring,
    ClickhouseDefault,
    FixedString,
    Float32,
    Float64,
    Int8,
    Int16,
    Int32,
    Int64,
    JWT,
    Key,
    LowCardinality,
    SimpleAggregateFunction,
    UInt8,
    UInt16,
    UInt32,
    UInt64,
    clickhouse_datetime64,
    clickhouse_decimal,
    aggregated,
    simple_aggregated,
)
from moosestack_spark.datamodel.reflection import (  # noqa: F401
    Column,
    to_columns,
    to_struct_type,
)
