"""Unit tests for RFC 3986 URL canonicalization (SURVEY.md P1)."""

from __future__ import annotations

import pytest

from deepcrawl4ai_spark.functions.urlnorm import (
    host_hash_64,
    normalize_url,
    sha1_hex,
    url_host,
    url_slug,
)


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("example.com", "https://example.com/"),
        ("HTTP://Example.COM:80/x", "http://example.com/x"),
        ("https://example.com:443/x", "https://example.com/x"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("http://a.com/x/../y", "http://a.com/y"),
        ("http://a.com/x/./y", "http://a.com/x/y"),
        ("http://a.com/x/..", "http://a.com/"),
        ("http://a.com", "http://a.com/"),
        ("http://a.com/%7Euser", "http://a.com/~user"),
        ("http://a.com/%2fpath", "http://a.com/%2Fpath"),
        ("http://a.com/p?b=2&a=1", "http://a.com/p?a=1&b=2"),
        ("http://a.com/p?a=1#frag", "http://a.com/p?a=1"),
        ("http://a.com./p", "http://a.com/p"),
        # duplicate-after-normalization pair (FIXTURES.md §2)
        ("HTTP://A.com:80/x/../y", "http://a.com/y"),
        ("http://a.com/y", "http://a.com/y"),
    ],
)
def test_normalize_url(raw: str, expected: str) -> None:
    assert normalize_url(raw) == expected


def test_idempotent() -> None:
    urls = [
        "Example.com/a/b/../c?z=1&y=2#f",
        "http://X.com:80/%41%2f",
        "https://h.com:443/p/./q/../r",
    ]
    for u in urls:
        once = normalize_url(u)
        assert normalize_url(once) == once


def test_host_and_hash() -> None:
    assert url_host("http://a.com:8080/x/y") == "a.com:8080"
    assert url_host("https://b.org/") == "b.org"
    assert host_hash_64("a.com") == host_hash_64("a.com")
    assert host_hash_64("a.com") != host_hash_64("b.com")


def test_sha1() -> None:
    # well-known SHA-1 of 'abc'
    assert sha1_hex("abc") == "a9993e364706816aba3e25717850c26c9cd0d89d"


def test_slug() -> None:
    assert url_slug("https://a.com/p q/x") == "a-com-p-q-x"


def test_udfs_match_scalar(spark) -> None:
    from pyspark.sql import functions as F

    from deepcrawl4ai_spark.functions.urlnorm import with_url_columns

    raw = ["HTTP://A.com:80/x/../y?b=2&a=1#f", "b.org/path/%7Ez", "https://C.net:8443/."]
    df = spark.createDataFrame([(u,) for u in raw], ["url"])
    rows = {r["url"]: r for r in with_url_columns(df).collect()}
    for u in raw:
        n = normalize_url(u)
        assert rows[u]["url_norm"] == n
        assert rows[u]["url_hash"] == sha1_hex(n)
        assert rows[u]["host"] == url_host(n)
        assert rows[u]["host_hash"] == host_hash_64(url_host(n))
