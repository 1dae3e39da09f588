"""Property-based tests (hypothesis) for URL canonicalization — the seen-set
is only as sound as the normalizer's invariants."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from deepcrawl4ai_spark.functions.urlnorm import (
    host_hash_64,
    normalize_url,
    sha1_hex,
    url_host,
)

_host = st.from_regex(r"[a-z][a-z0-9-]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)
_path_seg = st.from_regex(r"[A-Za-z0-9._~-]{0,8}|\.|\.\.", fullmatch=True)
_scheme = st.sampled_from(["http", "https", "HTTP", "HTTPS", ""])
_query = st.lists(
    st.tuples(st.from_regex(r"[a-z]{1,4}", fullmatch=True), st.integers(0, 99)),
    max_size=4,
)


@st.composite
def urls(draw):
    scheme = draw(_scheme)
    host = draw(_host)
    segs = draw(st.lists(_path_seg, max_size=5))
    q = draw(_query)
    frag = draw(st.sampled_from(["", "#frag", "#x"]))
    base = (scheme + "://" if scheme else "") + host + "/" + "/".join(segs)
    if q:
        base += "?" + "&".join(f"{k}={v}" for k, v in q)
    return base + frag


@given(urls())
@settings(max_examples=300, deadline=None)
def test_idempotent(u: str) -> None:
    once = normalize_url(u)
    assert normalize_url(once) == once


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonical_shape(u: str) -> None:
    n = normalize_url(u)
    assert n.startswith(("http://", "https://"))
    assert "#" not in n
    host = url_host(n)
    assert host == host.lower()
    assert not host.endswith((":80", ":443"))
    path = n.split("://", 1)[1][len(host):]
    assert "/./" not in path and "/../" not in path
    # query params sorted
    if "?" in n:
        pairs = n.split("?", 1)[1].split("&")
        assert pairs == sorted(pairs)


@given(urls())
@settings(max_examples=200, deadline=None)
def test_hashes_follow_normal_form(u: str) -> None:
    n = normalize_url(u)
    assert sha1_hex(n) == sha1_hex(normalize_url(n))
    assert isinstance(host_hash_64(url_host(n)), int)


@given(_host, st.integers(0, 999))
@settings(max_examples=200, deadline=None)
def test_equivalent_spellings_collide(host: str, page: int) -> None:
    """The duplicate-after-normalization invariant (FIXTURES.md §2)."""
    clean = f"https://{host}/p/{page}"
    variants = [
        f"HTTPS://{host.upper()}/p/{page}",
        f"https://{host}:443/p/{page}",
        f"https://{host}/x/../p/{page}",
        f"https://{host}/p/{page}#frag",
        f"https://{host}./p/{page}",
    ]
    want = normalize_url(clean)
    for v in variants:
        assert normalize_url(v) == want, v
