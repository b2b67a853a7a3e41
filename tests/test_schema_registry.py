"""Schema-registry semantics (LocalSchemaRegistry + JsonSchemaSerializer):
id/subject/version model, idempotent registration, the three reference
lookup shapes, wire-envelope round-trip interop with the stream-side
strip/sr_schema_id expressions, and restart persistence."""

from __future__ import annotations

import pytest
from pydantic import BaseModel

from moosestack_spark.streaming.schema_registry import (
    JsonSchemaSerializer,
    KafkaSchemaConfig,
    LocalSchemaRegistry,
    SchemaById,
    SubjectLatest,
    SubjectVersion,
    model_json_schema,
)


class Ev(BaseModel):
    id: int
    kind: str


def test_register_is_idempotent_and_versions_count_per_subject():
    r = LocalSchemaRegistry()
    s1 = r.register("events-value", model_json_schema(Ev))
    again = r.register("events-value", model_json_schema(Ev))
    assert (s1.id, s1.version) == (again.id, again.version) == (1, 1)

    class Ev2(BaseModel):
        id: int
        kind: str
        extra: float

    s2 = r.register("events-value", model_json_schema(Ev2))
    assert s2.version == 2 and s2.id == 2
    other = r.register("other-value", model_json_schema(Ev))
    assert other.version == 1 and other.id == 3  # ids global, versions per subject


def test_resolve_all_three_reference_shapes():
    r = LocalSchemaRegistry()
    s1 = r.register("events-value", model_json_schema(Ev))
    assert r.resolve(
        KafkaSchemaConfig(kind="JSON", reference=SchemaById(id=s1.id))
    ) == s1
    assert r.resolve(
        KafkaSchemaConfig(kind="JSON", reference=SubjectLatest(name="events-value"))
    ) == s1
    assert r.resolve(
        KafkaSchemaConfig(
            kind="JSON", reference=SubjectVersion(subject="events-value", version=1)
        )
    ) == s1


def test_serializer_roundtrip_and_validation():
    r = LocalSchemaRegistry()
    rs = r.register("events-value", model_json_schema(Ev))
    ser = JsonSchemaSerializer(
        r, KafkaSchemaConfig(kind="JSON", reference=SchemaById(id=rs.id))
    )
    wire = ser.serialize(Ev(id=7, kind="a"))
    assert wire[0] == 0 and int.from_bytes(wire[1:5], "big") == rs.id
    back_schema, payload = ser.deserialize(wire)
    assert back_schema.id == rs.id and payload == {"id": 7, "kind": "a"}

    with pytest.raises(ValueError, match="missing required"):
        ser.serialize({"id": 7})
    with pytest.raises(ValueError, match="expected string"):
        ser.serialize({"id": 7, "kind": 42})


def test_wire_bytes_interop_with_stream_envelope_exprs(spark):
    """Producer bytes from the serializer must strip/parse through the
    SAME stream-side expressions the consume path uses."""
    from pyspark.sql import functions as F

    from moosestack_spark.streaming.stream import sr_schema_id, strip_sr_envelope

    r = LocalSchemaRegistry()
    rs = r.register("events-value", model_json_schema(Ev))
    ser = JsonSchemaSerializer(
        r, KafkaSchemaConfig(kind="JSON", reference=SubjectLatest(name="events-value"))
    )
    wire = ser.serialize(Ev(id=3, kind="z"))
    df = spark.createDataFrame([(wire,)], "value binary")
    row = df.select(
        sr_schema_id(F.col("value")).alias("sid"),
        strip_sr_envelope(F.col("value")).cast("string").alias("payload"),
    ).collect()[0]
    assert row.sid == rs.id
    import json

    assert json.loads(row.payload) == {"id": 3, "kind": "z"}


def test_registry_survives_restart(tmp_path):
    p = str(tmp_path / "registry.jsonl")
    r1 = LocalSchemaRegistry(p)
    rs = r1.register("events-value", model_json_schema(Ev))
    r2 = LocalSchemaRegistry(p)
    assert r2.get_schema(rs.id).schema == rs.schema
    # idempotent across restart: same id, no new version
    assert r2.register("events-value", model_json_schema(Ev)).id == rs.id
