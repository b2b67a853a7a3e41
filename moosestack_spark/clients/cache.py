"""MooseCache — the shared-state KV the reference backs with Redis
(py-moose-lib/moose_lib/clients/redis_client.py; ts clients/redisClient.ts).

Streaming transforms in the reference are stateless per-record; the only
cross-record state the framework offers is this cache (SURVEY.md §2.8).
Spark-side: durable aggregation state belongs in checkpointed streaming
aggregations / applyInPandasWithState, so this client exists for the
control-plane uses the reference has (rate limits, dedup cookies, feature
flags): a process-local dict with TTLs, optionally persisted to a JSON
file so separate driver runs share it.  Swap the storage for a real Redis
client on a cluster — the surface (get/set/delete/ttl, key prefixing) is
the reference's.
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Any, Optional

_DEFAULT_TTL = 3600.0  # reference default: 1h (redis_client.py)


class MooseCache:
    def __init__(self, prefix: str = "moose", path: Optional[str] = None):
        self.prefix = prefix
        self.path = path
        self._lock = threading.Lock()
        self._store: dict[str, tuple[Any, Optional[float]]] = {}
        if path and os.path.exists(path):
            with open(path) as f:
                raw = json.load(f)
            self._store = {k: (v, exp) for k, (v, exp) in raw.items()}

    def _k(self, key: str) -> str:
        return f"{self.prefix}:{key}"

    def _persist(self) -> None:
        if not self.path:
            return
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._store, f)
        os.replace(tmp, self.path)

    def set(self, key: str, value: Any, ttl_seconds: Optional[float] = _DEFAULT_TTL) -> None:
        # wall-clock deadlines, NOT time.monotonic(): the file persists
        # across processes/reboots and monotonic origins do not
        exp = time.time() + ttl_seconds if ttl_seconds is not None else None
        with self._lock:
            self._store[self._k(key)] = (value, exp)
            self._persist()

    def get(self, key: str, default: Any = None) -> Any:
        with self._lock:
            item = self._store.get(self._k(key))
            if item is None:
                return default
            value, exp = item
            if exp is not None and time.time() > exp:
                del self._store[self._k(key)]
                self._persist()
                return default
            return value

    def delete(self, key: str) -> bool:
        with self._lock:
            existed = self._store.pop(self._k(key), None) is not None
            if existed:
                self._persist()
            return existed

    def keys(self) -> list[str]:
        with self._lock:
            now = time.time()
            return [
                k[len(self.prefix) + 1 :]
                for k, (_, exp) in self._store.items()
                if exp is None or now <= exp
            ]

    def clear(self) -> None:
        with self._lock:
            self._store.clear()
            self._persist()
