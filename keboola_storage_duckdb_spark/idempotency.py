"""Idempotency replay cache (reference src/middleware/idempotency.py:
X-Idempotency-Key header, 10-minute TTL, replay returns the cached
response). Engine-side, framework-agnostic: wrap any mutating operation in
``IdempotencyCache.run`` and a retried request with the same key gets the
first call's result without re-executing."""

from __future__ import annotations

import threading
import time
from collections.abc import Callable


class IdempotencyCache:
    def __init__(self, ttl_seconds: float = 600.0) -> None:
        self.ttl = ttl_seconds
        self._entries: dict[str, tuple[float, object]] = {}
        self._lock = threading.Lock()

    def _purge(self, now: float) -> None:
        dead = [k for k, (ts, _) in self._entries.items()
                if now - ts > self.ttl]
        for k in dead:
            del self._entries[k]

    def get(self, key: str) -> object | None:
        """Cached result for ``key`` within the TTL, else None — the replay
        probe for HTTP middleware (the reference checks the request cache
        before dispatch, src/middleware/idempotency.py)."""
        now = time.time()
        with self._lock:
            self._purge(now)
            entry = self._entries.get(key)
            return entry[1] if entry else None

    def put(self, key: str, value: object) -> None:
        """Record ``key``'s response for replay. First writer wins."""
        with self._lock:
            self._entries.setdefault(key, (time.time(), value))

    def run(self, key: str | None, fn: Callable[[], object]) -> object:
        """Execute ``fn`` once per key within the TTL; replays return the
        cached result. ``key=None`` bypasses caching (no header sent)."""
        if key is None:
            return fn()
        now = time.time()
        with self._lock:
            self._purge(now)
            if key in self._entries:
                return self._entries[key][1]
        result = fn()  # run outside the lock: fn may be slow
        with self._lock:
            # first writer wins — a concurrent duplicate returns ours
            self._entries.setdefault(key, (now, result))
            return self._entries[key][1]
