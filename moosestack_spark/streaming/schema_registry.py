"""Schema-registry integration: id<->schema mapping + JSON serializer.

Port target: py-moose-lib/moose_lib/dmv2/stream.py:20-39 (KafkaSchemaConfig,
SubjectLatest/SubjectVersion/SchemaById references) and :387-418 (producer
serializes through the registry's JSONSerializer).  The reference talks to a
Confluent Schema Registry over HTTP; this container has no registry, so the
semantics live in LocalSchemaRegistry — the same subject/version/id model
and the same wire format (0x00 + 4-byte big-endian id + payload, shared
with streaming/stream.py strip_sr_envelope/add_sr_envelope) — with a
file-backed store so ids survive process restarts.  A deployment fronted by
a real registry swaps the client; every call site keeps its shape.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Literal, Optional, Union

from pydantic import BaseModel


class SubjectLatest(BaseModel):
    name: str


class SubjectVersion(BaseModel):
    subject: str
    version: int


class SchemaById(BaseModel):
    id: int


class KafkaSchemaConfig(BaseModel):
    kind: Literal["JSON"]  # stream.py:392 — "Currently JSON Schema is supported."
    reference: Union[SubjectLatest, SubjectVersion, SchemaById]


@dataclass(frozen=True)
class RegisteredSchema:
    id: int
    subject: str
    version: int
    schema: dict


def _canonical(schema: dict) -> str:
    return json.dumps(schema, sort_keys=True, separators=(",", ":"))


class LocalSchemaRegistry:
    """Confluent-registry semantics in-process: ids are global and assigned
    once per canonical schema text; versions count per subject; lookups by
    id, latest-of-subject, or (subject, version).  Registration is
    idempotent — re-registering an identical schema under the same subject
    returns the existing id (exactly the registry contract producers rely
    on for restarts)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._by_id: dict[int, RegisteredSchema] = {}
        self._versions: dict[str, list[RegisteredSchema]] = {}
        self._next_id = 1
        if path and os.path.exists(path):
            for line in open(path):
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                rs = RegisteredSchema(
                    rec["id"], rec["subject"], rec["version"], rec["schema"]
                )
                self._store(rs)

    def _store(self, rs: RegisteredSchema) -> None:
        self._by_id[rs.id] = rs
        self._versions.setdefault(rs.subject, []).append(rs)
        self._next_id = max(self._next_id, rs.id + 1)

    def register(self, subject: str, schema: dict) -> RegisteredSchema:
        canon = _canonical(schema)
        for rs in self._versions.get(subject, []):
            if _canonical(rs.schema) == canon:
                return rs
        rs = RegisteredSchema(
            id=self._next_id,
            subject=subject,
            version=len(self._versions.get(subject, [])) + 1,
            schema=schema,
        )
        self._store(rs)
        if self.path:
            with open(self.path, "a") as fh:
                fh.write(
                    json.dumps(
                        {
                            "id": rs.id,
                            "subject": rs.subject,
                            "version": rs.version,
                            "schema": rs.schema,
                        }
                    )
                    + "\n"
                )
        return rs

    def get_schema(self, schema_id: int) -> RegisteredSchema:
        return self._by_id[schema_id]

    def get_latest_version(self, subject: str) -> RegisteredSchema:
        return self._versions[subject][-1]

    def get_version(self, subject: str, version: int) -> RegisteredSchema:
        return self._versions[subject][version - 1]

    def resolve(self, cfg: KafkaSchemaConfig) -> RegisteredSchema:
        """The reference's three lookup shapes (stream.py:404-411)."""
        ref = cfg.reference
        if isinstance(ref, SchemaById):
            return self.get_schema(ref.id)
        if isinstance(ref, SubjectLatest):
            return self.get_latest_version(ref.name)
        return self.get_version(ref.subject, ref.version)


def _check_json_schema(value: Any, schema: dict, path: str = "$") -> None:
    """Minimal JSON-Schema validation (type / required / properties /
    items) — the checks the reference's JSONSerializer would reject on.
    Raises ValueError with the failing path."""
    t = schema.get("type")
    if t:
        py_ok = {
            "object": dict,
            "array": list,
            "string": str,
            "integer": int,
            "number": (int, float),
            "boolean": bool,
            "null": type(None),
        }[t]
        if t == "integer" and isinstance(value, bool):
            raise ValueError(f"{path}: expected integer, got bool")
        if not isinstance(value, py_ok):
            raise ValueError(f"{path}: expected {t}, got {type(value).__name__}")
    if t == "object":
        for req in schema.get("required", []):
            if req not in value:
                raise ValueError(f"{path}: missing required property {req!r}")
        for k, sub in schema.get("properties", {}).items():
            if k in value:
                _check_json_schema(value[k], sub, f"{path}.{k}")
    if t == "array":
        items = schema.get("items")
        if items:
            for i, v in enumerate(value):
                _check_json_schema(v, items, f"{path}[{i}]")


class JsonSchemaSerializer:
    """stream.py:413-417 — validate against the registered schema, then
    frame with the Confluent wire envelope."""

    def __init__(self, registry: LocalSchemaRegistry, cfg: KafkaSchemaConfig):
        if cfg.kind != "JSON":
            raise NotImplementedError("Currently JSON Schema is supported.")
        self.registry = registry
        self.registered = registry.resolve(cfg)

    def serialize(self, record: BaseModel | dict) -> bytes:
        payload = record.model_dump() if isinstance(record, BaseModel) else record
        _check_json_schema(payload, self.registered.schema)
        body = json.dumps(payload, sort_keys=True).encode()
        return bytes([0]) + self.registered.id.to_bytes(4, "big") + body

    def deserialize(self, data: bytes) -> tuple[RegisteredSchema, dict]:
        """Consumer side: envelope -> (schema, payload); the payload is
        re-validated so a schema-id/payload mismatch fails loudly."""
        if len(data) < 5 or data[0] != 0:
            raise ValueError("not a Confluent-framed message")
        rs = self.registry.get_schema(int.from_bytes(data[1:5], "big"))
        payload = json.loads(data[5:])
        _check_json_schema(payload, rs.schema)
        return rs, payload


def model_json_schema(model: type[BaseModel]) -> dict:
    """The subject schema a typed Stream registers (pydantic's JSON Schema
    — the same document the reference publishes for JSON-kind configs)."""
    return model.model_json_schema()
