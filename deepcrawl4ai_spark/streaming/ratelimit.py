"""Per-client API rate limiting — the reference's middleware token bucket
(reference server.py:302-348 rate-limits the /crawl endpoints per client;
redisCache.py:85-96 TokenBucket: capacity + refill with a carried balance).

The engine already runs per-HOST politeness buckets inside the round loop
(R3/R4, engine.py token_bucket); this is the SAME arithmetic keyed by
client id at the API edge. Deterministic by construction: time is a
caller-supplied monotonic value (a serving layer passes its clock; tests
pass a logical one), so behavior replays exactly — no wall clock anywhere,
matching the engine's determinism rule.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class _Bucket:
    tokens: float
    last_ts: float


class ClientRateLimiter:
    """capacity = burst size, refill_rate = tokens/second (reference
    defaults: cap 10, refill 5 per window)."""

    def __init__(self, capacity: float = 10.0, refill_rate: float = 5.0):
        if capacity <= 0 or refill_rate <= 0:
            raise ValueError("capacity and refill_rate must be positive")
        self.capacity = float(capacity)
        self.refill_rate = float(refill_rate)
        self._buckets: dict[str, _Bucket] = {}

    def _refill(self, client_id: str, now: float) -> _Bucket:
        b = self._buckets.get(client_id)
        if b is None:
            b = _Bucket(tokens=self.capacity, last_ts=now)
            self._buckets[client_id] = b
            return b
        if now > b.last_ts:
            b.tokens = min(self.capacity, b.tokens + (now - b.last_ts) * self.refill_rate)
            b.last_ts = now
        return b

    def allow(self, client_id: str, now: float, cost: float = 1.0) -> bool:
        """Consume *cost* tokens if available; False = reject (HTTP 429)."""
        b = self._refill(client_id, now)
        if b.tokens >= cost:
            b.tokens -= cost
            return True
        return False

    def retry_after(self, client_id: str, now: float, cost: float = 1.0) -> float:
        """Seconds until *cost* tokens will be available (0 = now) — the
        Retry-After header value the reference middleware returns."""
        b = self._refill(client_id, now)
        if b.tokens >= cost:
            return 0.0
        return (cost - b.tokens) / self.refill_rate

    def balance(self, client_id: str, now: float) -> float:
        return self._refill(client_id, now).tokens
