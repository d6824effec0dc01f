"""Failed-login rate limiting (net-new; the reference has none).

A sliding-window failure counter keyed by identity (email + client IP):
``LOGIN_RATE_LIMIT`` failures inside ``LOGIN_RATE_WINDOW_S`` block
further attempts with 429 until the oldest failure ages out. Successful
logins clear the key — a legitimate user who mistypes twice is never
punished after getting in.

In-memory and per-process by design: the goal is blunting online
brute-force against scrypt (which is already slow), not cross-replica
accounting. Memory is bounded (keys pruned on touch + oldest-key
eviction past ``max_keys``). OPT-IN via settings — the default
``LOGIN_RATE_LIMIT=0`` keeps exact reference contract parity (no
surprise 429s).
"""

from __future__ import annotations

import threading
import time
from typing import Callable


class FailureWindow:
    def __init__(self, clock: Callable[[], float] = time.monotonic,
                 max_keys: int = 10_000):
        self._clock = clock
        self._max_keys = max_keys
        self._lock = threading.Lock()
        self._hits: dict[str, list[float]] = {}

    def _prune(self, key: str, window_s: float, now: float) -> list[float]:
        hits = [t for t in self._hits.get(key, []) if now - t < window_s]
        if hits:
            self._hits[key] = hits
        else:
            self._hits.pop(key, None)
        return hits

    def retry_after(self, key: str, limit: int, window_s: float) -> float:
        """Seconds until the key may try again (0.0 = not blocked)."""
        if limit <= 0:
            return 0.0
        now = self._clock()
        with self._lock:
            hits = self._prune(key, window_s, now)
            if len(hits) < limit:
                return 0.0
            return max(0.0, window_s - (now - hits[0]))

    def record_failure(self, key: str, window_s: float) -> None:
        now = self._clock()
        with self._lock:
            hits = self._prune(key, window_s, now)
            self._hits[key] = hits + [now]
            if len(self._hits) > self._max_keys:
                # oldest-latest-hit key goes first (simple bounded memory)
                victim = min(self._hits, key=lambda k: self._hits[k][-1])
                if victim != key:
                    self._hits.pop(victim, None)

    def clear(self, key: str) -> None:
        with self._lock:
            self._hits.pop(key, None)


# process-wide instance used by the login route
login_failures = FailureWindow()
