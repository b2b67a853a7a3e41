"""MooseCache parity (clients/redis_client.py surface)."""

from __future__ import annotations

import time

from moosestack_spark.clients import MooseCache


def test_set_get_delete_prefixing(tmp_path):
    c = MooseCache(prefix="app")
    c.set("k", {"a": 1})
    assert c.get("k") == {"a": 1}
    assert c.keys() == ["k"]
    assert c.delete("k") and not c.delete("k")
    assert c.get("k", "fallback") == "fallback"


def test_ttl_expiry():
    c = MooseCache()
    c.set("t", 1, ttl_seconds=0.05)
    assert c.get("t") == 1
    time.sleep(0.08)
    assert c.get("t") is None
    assert c.keys() == []


def test_file_persistence_across_instances(tmp_path):
    p = str(tmp_path / "cache.json")
    a = MooseCache(path=p)
    a.set("shared", [1, 2, 3], ttl_seconds=None)
    b = MooseCache(path=p)
    assert b.get("shared") == [1, 2, 3]
