"""Job-config utilities (SURVEY.md J2/P10).

- config_signature: SHA-1 of canonical (sorted-key) JSON — the reference's
  browser-pool key idiom (crawler_pool.py:21-23), used here to key
  executor-local fetch sessions and to dedup identical job configs.
- safe_load_config: the reference's safe_eval_config (utils.py:116-144)
  re-done WITHOUT eval: a declarative dict with an allowlisted key schema —
  unknown keys and non-scalar values are rejected. No AST tricks needed
  because configs are data, not code, in this engine.
"""

from __future__ import annotations

import hashlib
import json

ALLOWED_KEYS: dict[str, type | tuple] = {
    "global_budget": int,
    "max_rounds": int,
    "max_depth": int,
    "max_attempts": int,
    "budget_scale": int,
    "record_order": bool,
    "adaptive_budget": bool,
    "base_budget": int,
    "exclude_external_links": bool,
    "exclude_social_media_links": bool,
    "word_count_threshold": int,
    "filter_type": str,  # raw | fit | bm25 | llm (reference FilterType, utils.py:45-49)
    "query": str,
}

FILTER_TYPES = ("raw", "fit", "bm25", "llm")


def config_signature(config: dict) -> str:
    """SHA-1 of sorted-key JSON (reference crawler_pool.py:21-23)."""
    payload = json.dumps(config, sort_keys=True, separators=(",", ":"))
    return hashlib.sha1(payload.encode("utf-8")).hexdigest()


def safe_load_config(config: dict) -> dict:
    """Validate a user-supplied config dict against the allowlist.
    Raises ValueError on unknown keys, wrong types, or invalid enums."""
    if not isinstance(config, dict):
        raise ValueError("config must be a dict")
    out: dict = {}
    for k, v in config.items():
        if k not in ALLOWED_KEYS:
            raise ValueError(f"unknown config key: {k!r}")
        want = ALLOWED_KEYS[k]
        if not isinstance(v, want) or isinstance(v, bool) and want is int:
            raise ValueError(f"config key {k!r}: expected {want}, got {type(v).__name__}")
        out[k] = v
    if "filter_type" in out and out["filter_type"] not in FILTER_TYPES:
        raise ValueError(f"filter_type must be one of {FILTER_TYPES}")
    return out
