"""Confluent wire-format handling (runner.ts:274-281)."""

from __future__ import annotations

import json
import struct

from pyspark.sql import functions as F

from moosestack_spark.streaming.stream import (
    add_sr_envelope,
    sr_schema_id,
    strip_sr_envelope,
)


def test_strip_and_schema_id(spark):
    payload = json.dumps({"a": 1}).encode()
    enveloped = b"\x00" + struct.pack(">I", 4242) + payload
    bare = payload
    short = b"\x00\x01"  # too short to be an envelope
    df = spark.createDataFrame(
        [(1, enveloped), (2, bare), (3, short)], "id int, value binary"
    )
    out = df.select(
        "id",
        strip_sr_envelope(F.col("value")).alias("payload"),
        sr_schema_id(F.col("value")).alias("sid"),
    ).collect()
    rows = {r.id: r for r in out}
    assert bytes(rows[1].payload) == payload and rows[1].sid == 4242
    assert bytes(rows[2].payload) == bare and rows[2].sid is None
    assert bytes(rows[3].payload) == short and rows[3].sid is None
    # stripped payload parses as the original JSON
    parsed = (
        df.filter("id = 1")
        .select(
            F.get_json_object(
                strip_sr_envelope(F.col("value")).cast("string"), "$.a"
            ).alias("a")
        )
        .collect()[0]
    )
    assert parsed.a == "1"


from pydantic import BaseModel  # noqa: E402

from moosestack_spark.api import Api, clear_apis  # noqa: E402
from moosestack_spark.datamodel import JWT  # noqa: E402


class MeParams(BaseModel):
    user_id: JWT[int]
    limit: int = 10


def test_jwt_param_injection(spark):
    clear_apis()

    def handler(p, utils):
        return utils.spark.sql(f"SELECT {p.user_id} AS uid, {p.limit} AS lim")

    api = Api("me", MeParams, handler)
    row = api.call(spark, jwt={"user_id": 7}, limit=3).collect()[0]
    assert (row.uid, row.lim) == (7, 3)
    # spoof attempt via query param is overwritten by the claim
    row = api.call(spark, jwt={"user_id": 7}, user_id=999, limit=3).collect()[0]
    assert row.uid == 7
    # no token -> rejected
    import pytest as _pytest

    with _pytest.raises(PermissionError):
        api.call(spark, limit=3)
    clear_apis()


class VParams(BaseModel):
    n: int = 1


def test_api_version_resolution(spark):
    """Route/version resolution (runner.ts:163-237): exact version wins,
    unversioned registration is the fallback, unknown version without a
    fallback raises."""
    clear_apis()

    def mk(tag):
        return lambda p, u: u.spark.sql(f"SELECT '{tag}' AS v")

    from moosestack_spark.api import get_api

    Api("q", VParams, mk("unversioned"))
    Api("q", VParams, mk("v2"), version="2.0")

    assert get_api("q", "2.0").call(spark).collect()[0].v == "v2"
    assert get_api("q", None).call(spark).collect()[0].v == "unversioned"
    # unknown version falls back to the unversioned registration
    assert get_api("q", "9.9").call(spark).collect()[0].v == "unversioned"

    import pytest as _pytest

    Api("only_versioned", VParams, mk("v1"), version="1.0")
    with _pytest.raises(KeyError):
        get_api("only_versioned", "3.0")
    clear_apis()


def test_produce_consume_envelope_roundtrip(spark):
    """Producer-side envelope (add_sr_envelope) roundtrips through the
    consume-side strip + schema-id extraction."""
    df = spark.createDataFrame(
        [(b'{"a": 1}',), (b'{"a": 2}',)], "payload binary"
    )
    enveloped = df.select(
        add_sr_envelope(F.col("payload"), schema_id=1234).alias("value")
    )
    back = enveloped.select(
        strip_sr_envelope(F.col("value")).alias("payload"),
        sr_schema_id(F.col("value")).alias("sid"),
    ).collect()
    assert [bytes(r.payload) for r in back] == [b'{"a": 1}', b'{"a": 2}']
    assert [r.sid for r in back] == [1234, 1234]
    # wire bytes: 0x00 magic + big-endian id
    raw = bytes(enveloped.collect()[0].value)
    assert raw[0] == 0 and int.from_bytes(raw[1:5], "big") == 1234

    import pytest as _p

    with _p.raises(ValueError):
        add_sr_envelope(F.col("payload"), schema_id=-1)
