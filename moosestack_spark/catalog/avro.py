"""Minimal Apache Avro object-container codec (pure stdlib).

Exists for the native Iceberg metadata layer (catalog/iceberg_native.py):
Iceberg manifest lists and manifests are Avro container files, and the
sandbox has no Iceberg/Avro jars.  Implements the public Avro 1.11 spec
subset those files need:

- container framing: magic ``Obj\\x01``, file metadata map (embedded JSON
  schema + codec), 16-byte sync marker, data blocks (count, byte size,
  payload, sync);
- codecs: ``null`` and ``deflate`` (raw zlib stream, RFC 1951);
- binary encoding: zigzag varint longs/ints, IEEE little-endian
  float/double, length-prefixed bytes/strings, records field-by-field,
  arrays/maps in blocks (negative block count = byte-size-prefixed form),
  unions by zigzag branch index, fixed, enum;
- schema-driven: the decoder walks the JSON schema embedded in the file,
  so any record shape (including Iceberg's nested ``data_file`` struct and
  field-id annotations, which are ignored here) round-trips.

Logical types (timestamps etc.) are surfaced as their underlying
primitives — Iceberg's reader layer interprets them.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise ValueError("truncated Avro varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(acc)
        shift += 7
        if shift > 70:
            raise ValueError("Avro varint too long")


def write_bytes(buf: io.BytesIO, data: bytes) -> None:
    write_long(buf, len(data))
    buf.write(data)


def read_bytes(buf: io.BytesIO) -> bytes:
    n = read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise ValueError("truncated Avro bytes")
    return data


# ---------------------------------------------------------------------------
# schema-driven encode/decode
# ---------------------------------------------------------------------------


def _norm_schema(schema, named: dict):
    """Resolve named-type references and normalize shorthand strings."""
    if isinstance(schema, str):
        if schema in named:
            return named[schema]
        return {"type": schema}
    if isinstance(schema, list):
        return schema
    if isinstance(schema, dict) and schema.get("name"):
        named.setdefault(schema["name"], schema)
    return schema


def decode_value(buf: io.BytesIO, schema, named: dict | None = None):
    named = named if named is not None else {}
    schema = _norm_schema(schema, named)
    if isinstance(schema, list):  # union
        idx = read_long(buf)
        if not (0 <= idx < len(schema)):
            raise ValueError(f"union branch {idx} out of range")
        return decode_value(buf, schema[idx], named)
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(t, (dict, list)):  # nested type object
        return decode_value(buf, t, named)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) != b"\x00"
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return read_bytes(buf)
    if t == "string":
        return read_bytes(buf).decode("utf-8")
    if t == "fixed":
        if isinstance(schema, dict) and schema.get("name"):
            named.setdefault(schema["name"], schema)
        return buf.read(schema["size"])
    if t == "enum":
        if isinstance(schema, dict) and schema.get("name"):
            named.setdefault(schema["name"], schema)
        return schema["symbols"][read_long(buf)]
    if t == "record" or t == "struct":
        if isinstance(schema, dict) and schema.get("name"):
            named.setdefault(schema["name"], schema)
        out = {}
        for f in schema["fields"]:
            out[f["name"]] = decode_value(buf, f["type"], named)
        return out
    if t == "array":
        items = []
        while True:
            count = read_long(buf)
            if count == 0:
                break
            if count < 0:
                read_long(buf)  # byte size, unused
                count = -count
            for _ in range(count):
                items.append(decode_value(buf, schema["items"], named))
        return items
    if t == "map":
        out = {}
        while True:
            count = read_long(buf)
            if count == 0:
                break
            if count < 0:
                read_long(buf)
                count = -count
            for _ in range(count):
                k = read_bytes(buf).decode("utf-8")
                out[k] = decode_value(buf, schema["values"], named)
        return out
    raise ValueError(f"unsupported Avro type {t!r}")


def encode_value(buf: io.BytesIO, schema, value, named: dict | None = None) -> None:
    named = named if named is not None else {}
    schema = _norm_schema(schema, named)
    if isinstance(schema, list):  # union: first matching branch
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type", branch)
            if value is None and (branch == "null" or bt == "null"):
                write_long(buf, i)
                return
            if value is not None and branch != "null" and bt != "null":
                write_long(buf, i)
                encode_value(buf, branch, value, named)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(t, (dict, list)):
        encode_value(buf, t, value, named)
        return
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", value))
    elif t == "double":
        buf.write(struct.pack("<d", value))
    elif t == "bytes":
        write_bytes(buf, value)
    elif t == "string":
        write_bytes(buf, value.encode("utf-8"))
    elif t == "fixed":
        if isinstance(schema, dict) and schema.get("name"):
            named.setdefault(schema["name"], schema)
        if len(value) != schema["size"]:
            raise ValueError("fixed size mismatch")
        buf.write(value)
    elif t == "enum":
        if isinstance(schema, dict) and schema.get("name"):
            named.setdefault(schema["name"], schema)
        write_long(buf, schema["symbols"].index(value))
    elif t == "record":
        if isinstance(schema, dict) and schema.get("name"):
            named.setdefault(schema["name"], schema)
        for f in schema["fields"]:
            if f["name"] not in value:
                raise ValueError(f"record missing field {f['name']!r}")
            encode_value(buf, f["type"], value[f["name"]], named)
    elif t == "array":
        if value:
            write_long(buf, len(value))
            for item in value:
                encode_value(buf, schema["items"], item, named)
        write_long(buf, 0)
    elif t == "map":
        if value:
            write_long(buf, len(value))
            for k, v in value.items():
                write_bytes(buf, k.encode("utf-8"))
                encode_value(buf, schema["values"], v, named)
        write_long(buf, 0)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------

_SYNC = bytes(range(16))  # deterministic sync marker (any 16 bytes are legal)


def write_container(
    path: str,
    schema: dict,
    records: list[dict],
    codec: str = "deflate",
    extra_meta: dict[str, bytes] | None = None,
) -> None:
    buf = io.BytesIO()
    buf.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
        **(extra_meta or {}),
    }
    write_long(buf, len(meta))
    for k, v in meta.items():
        write_bytes(buf, k.encode("utf-8"))
        write_bytes(buf, v)
    write_long(buf, 0)
    buf.write(_SYNC)
    if records:
        block = io.BytesIO()
        named: dict = {}
        for rec in records:
            encode_value(block, schema, rec, named)
        payload = block.getvalue()
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw RFC1951 stream
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec}")
        write_long(buf, len(records))
        write_long(buf, len(payload))
        buf.write(payload)
        buf.write(_SYNC)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(buf.getvalue())
    os.replace(tmp, path)


def read_container(path: str) -> tuple[dict, list[dict]]:
    """-> (schema, records)."""
    with open(path, "rb") as fh:
        buf = io.BytesIO(fh.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro container (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        count = read_long(buf)
        if count == 0:
            break
        if count < 0:
            read_long(buf)
            count = -count
        for _ in range(count):
            k = read_bytes(buf).decode("utf-8")
            meta[k] = read_bytes(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    records: list[dict] = []
    named: dict = {}
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = read_long(buf)
        size = read_long(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec != "null":
            raise NotImplementedError(f"Avro codec {codec!r} (null/deflate supported)")
        block = io.BytesIO(payload)
        for _ in range(count):
            records.append(decode_value(block, schema, named))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: Avro sync marker mismatch")
    return schema, records
