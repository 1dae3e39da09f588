"""URL canonicalization: RFC 3986 normalize + SHA-1, vectorized.

The reference only prepends ``https://`` when the scheme is missing and
percent-unquotes (reference tasks.py:343, api.py:210, api.py:731-733); the
north_rule upgrades this to full RFC 3986 normalization with SHA-1 hashing in
pandas/Arrow UDFs. Scalar functions here are the single source of truth — the
Spark UDFs, the deterministic fetcher, and the pure-Python reference simulator
all call the same code, which is what makes crawl-order / seen-set equality
checkable byte-for-byte.

Normalization rules (RFC 3986 §6):
- missing scheme → https (reference idiom)
- scheme + host lowercased
- default port stripped (http:80, https:443)
- percent-encoding: unreserved characters decoded, hex digits uppercased
- dot-segments resolved (§5.2.4)
- empty path → "/"
- query parameters sorted by (key, value); fragment dropped
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator
from urllib.parse import parse_qsl, urlencode, urlsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_UNRESERVED = set("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")
_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")
_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


def _norm_pct(s: str) -> str:
    """Decode unreserved percent-escapes; uppercase the rest."""

    def repl(m: re.Match[str]) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
            continue
        out.append(seg)
    # preserve trailing slash semantics of "." / ".."
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    norm = "/".join(out)
    if not norm.startswith("/"):
        norm = "/" + norm
    return norm


def normalize_url(url: str) -> str:
    """Canonical RFC 3986 form of *url*. Pure, deterministic."""
    if url is None:
        return None  # type: ignore[return-value]
    url = url.strip()
    if not _SCHEME_RE.match(url):
        url = "https://" + url
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower().rstrip(".")
    port = parts.port
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    path = _norm_pct(parts.path)
    path = _remove_dot_segments(path) if path else "/"
    if parts.query:
        pairs = sorted(parse_qsl(parts.query, keep_blank_values=True))
        query = "?" + urlencode(pairs)
    else:
        query = ""
    return f"{scheme}://{host}{path}{query}"


def sha1_hex(s: str) -> str:
    return hashlib.sha1(s.encode("utf-8")).hexdigest()


def url_host(url_norm: str) -> str:
    """Host (incl. non-default port) of an already-normalized URL."""
    rest = url_norm.split("://", 1)[1] if "://" in url_norm else url_norm
    return rest.split("/", 1)[0]


def host_hash_64(host: str) -> int:
    """Stable signed-64 host hash (first 8 bytes of sha1, big-endian)."""
    d = hashlib.sha1(host.encode("utf-8")).digest()
    v = int.from_bytes(d[:8], "big", signed=True)
    return v


def url_slug(url: str) -> str:
    """netloc+path with non-alnum → '-' (reference url_to_unique_name, utils.py:176-180)."""
    parts = urlsplit(url if _SCHEME_RE.match(url) else "https://" + url)
    base = (parts.netloc or "") + (parts.path or "")
    return re.sub(r"[^a-zA-Z0-9_-]", "-", base)


# ---------------------------------------------------------------------------
# Vectorized Spark UDFs (Arrow-batched; no row-at-a-time Python UDF API)
# ---------------------------------------------------------------------------

@F.pandas_udf(T.StringType())
def normalize_urls_udf(urls: Iterator[pd.Series]) -> Iterator[pd.Series]:
    # memoize across the task's batches — crawl frontiers repeat URLs heavily
    # (same idiom as host_hash_udf); bounded so a pathological task can't
    # hold the whole input in the cache
    cache: dict[str, str] = {}
    for batch in urls:
        if len(cache) > (1 << 20):
            cache.clear()
        yield batch.map(
            lambda u: cache.setdefault(u, normalize_url(u)) if u is not None else None
        )


@F.pandas_udf(T.StringType())
def url_hash_udf(url_norms: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for batch in url_norms:
        yield batch.map(lambda u: sha1_hex(u) if u is not None else None)


@F.pandas_udf(T.StringType())
def url_host_udf(url_norms: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for batch in url_norms:
        yield batch.map(lambda u: url_host(u) if u is not None else None)


@F.pandas_udf(T.LongType())
def host_hash_udf(hosts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for batch in hosts:
        cache: dict[str, int] = {}
        yield batch.map(
            lambda h: cache.setdefault(h, host_hash_64(h)) if h is not None else None
        )


@F.pandas_udf(T.StringType())
def url_slug_udf(urls: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for batch in urls:
        yield batch.map(lambda u: url_slug(u) if u is not None else None)


def with_url_columns(df, url_col: str = "url"):
    """Attach url_norm / url_hash / host / host_hash to *df* — the standard
    canonicalization projection used by seed ingest and outlink processing."""
    df = df.withColumn("url_norm", normalize_urls_udf(F.col(url_col)))
    df = df.withColumn("url_hash", url_hash_udf(F.col("url_norm")))
    df = df.withColumn("host", url_host_udf(F.col("url_norm")))
    df = df.withColumn("host_hash", host_hash_udf(F.col("host")))
    return df
