"""API-edge identity + per-uid operation ownership — the analog of the
reference's JWT auth and per-user operation docs (reference auth.py token
verification; job.py:549 uid-from-JWT; crawlstore.py:4,25 Firestore
``users/{uid}/operations`` docs scoping every status read to the owner).

Scope note: this is the API SHIM layer above the engine — the engine itself
is identity-free. Kept deterministic like the rest of the repo: expiry and
rate-limit clocks are caller-supplied logical times, never wall clock, so
tests and replays are exact.

Pieces:
- signed bearer tokens (HMAC-SHA256 over ``uid.exp`` with a shared secret —
  the stdlib stand-in for the reference's JWT; same claims shape: subject +
  expiry);
- ``OperationOwnership``: op_id → owning uid registry; every status/metrics
  read goes through ``check`` and cross-uid access raises PermissionError
  (the reference returns 403/404 when the Firestore doc isn't under the
  caller's uid);
- ``AuthedRateLimiter``: the existing ClientRateLimiter token bucket keyed
  by AUTHENTICATED uid instead of client_ip (VERDICT r3 #9) — an invalid
  token is refused before any bucket is touched or created.
"""

from __future__ import annotations

import hashlib
import hmac


class AuthError(Exception):
    """Invalid, tampered, or expired token (HTTP 401 analog)."""


def issue_token(secret: str, uid: str, expires_at: float) -> str:
    """Mint ``uid.exp.sig`` — sig = HMAC-SHA256(secret, "uid.exp")."""
    if "." in uid:
        raise ValueError("uid must not contain '.'")
    claims = f"{uid}.{expires_at:.3f}"
    sig = hmac.new(secret.encode(), claims.encode(), hashlib.sha256).hexdigest()
    return f"{claims}.{sig}"


def verify_token(secret: str, token: str, now: float) -> str:
    """Token → uid; raises AuthError on bad shape, bad signature (constant-
    time compare), or expiry at logical time *now*."""
    claims, dot, sig = token.rpartition(".")
    uid, dot2, exp_s = claims.partition(".")  # exp itself may contain '.'
    if not (dot and dot2 and uid and exp_s and sig):
        raise AuthError("malformed token")
    want = hmac.new(secret.encode(), claims.encode(), hashlib.sha256).hexdigest()
    if not hmac.compare_digest(want, sig):
        raise AuthError("bad signature")
    try:
        exp = float(exp_s)
    except ValueError as e:
        raise AuthError("malformed expiry") from e
    if now >= exp:
        raise AuthError("token expired")
    return uid


class OperationOwnership:
    """op_id → owner uid; the ``users/{uid}/operations`` scoping rule.

    ``status`` is the guarded read path: it resolves the operation's
    CheckpointStore and returns its committed round metrics ONLY for the
    owner. At scale this registry is itself a (uid, op_id, store_root) dim
    table; here a dict — the CONTRACT (every read goes through ``check``)
    is what the tests pin."""

    def __init__(self) -> None:
        self._ops: dict[str, tuple[str, str]] = {}  # op_id -> (uid, store_root)

    def register(self, uid: str, op_id: str, store_root: str) -> None:
        owner = self._ops.get(op_id)
        if owner is not None and owner[0] != uid:
            raise PermissionError(f"operation {op_id} belongs to another user")
        self._ops[op_id] = (uid, store_root)

    def check(self, uid: str, op_id: str) -> str:
        """Return the op's store_root iff *uid* owns it. Unknown ops raise
        PermissionError too (404==403 here: existence is not leaked to
        non-owners, matching the reference's per-uid document paths)."""
        owner = self._ops.get(op_id)
        if owner is None or owner[0] != uid:
            raise PermissionError(f"operation {op_id} not found for user {uid}")
        return owner[1]

    def status(self, uid: str, op_id: str) -> list[dict]:
        """Owner-only: the operation's committed per-round metrics (the
        reference's operation status doc)."""
        from deepcrawl4ai_spark.frontier.checkpoint import CheckpointStore

        root = self.check(uid, op_id)
        return CheckpointStore(root).round_metrics()


class AuthedRateLimiter:
    """ClientRateLimiter keyed by verified uid: authentication happens
    FIRST, so unauthenticated traffic can neither consume nor create
    buckets, and one uid's burst can't starve another's."""

    def __init__(self, secret: str, capacity: float = 10.0, refill_rate: float = 5.0):
        from deepcrawl4ai_spark.streaming.ratelimit import ClientRateLimiter

        self._secret = secret
        self._rl = ClientRateLimiter(capacity=capacity, refill_rate=refill_rate)

    def allow(self, token: str, now: float, cost: float = 1.0) -> tuple[str, bool]:
        """(uid, allowed). AuthError propagates (401 before 429)."""
        uid = verify_token(self._secret, token, now)
        return uid, self._rl.allow(uid, now, cost)

    def retry_after(self, token: str, now: float, cost: float = 1.0) -> float:
        uid = verify_token(self._secret, token, now)
        return self._rl.retry_after(uid, now, cost)
