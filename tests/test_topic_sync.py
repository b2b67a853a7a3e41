"""Topic->topic version-bridge semantics (conform projection)."""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from moosestack_spark.streaming.topic_sync import TopicToTopicSync


def test_conform_defaults_drops_and_casts(spark):
    df = spark.createDataFrame(
        [(1, "a", 10, "extra")], "id long, name string, v int, legacy string"
    )
    v2 = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("v", DoubleType()),           # cast int -> double
            StructField("schema_version", IntegerType()),  # new, defaulted
            StructField("note", StringType()),        # new, no default -> NULL
        ]
    )
    sync = TopicToTopicSync(
        source="s_1", target="s_2", target_schema=v2, defaults={"schema_version": 2}
    )
    out = sync.conform(df)
    # nullability flags differ for literal-derived columns; names + types
    # are the version contract
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in v2.fields
    ]
    row = out.collect()[0]
    assert (row.id, row.name, row.v, row.schema_version, row.note) == (
        1, "a", 10.0, 2, None,
    )
    assert "legacy" not in out.columns


def test_conform_without_target_schema_is_passthrough(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    sync = TopicToTopicSync(source="a", target="b")
    assert sync.conform(df) is df
