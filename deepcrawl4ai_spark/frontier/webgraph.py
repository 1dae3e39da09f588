"""Deterministic synthetic web: page content + link structure derived purely
from sha1(normalized url).

This is the sandbox stand-in for the reference's Playwright fetch
(reference actions.py:218-293): every URL's span document, outlinks, and
fetch status are closed-form functions of its hash, so the Spark engine and
the pure-Python reference simulator observe byte-identical pages — which is
what makes crawl-order / seen-set / span-sequence equality testable
(BASELINE.json north_rule).

Host sizes are Zipf-distributed with hot hosts holding most pages AND
attracting most cross-host links — this exercises the skew/salting path.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import lru_cache

from deepcrawl4ai_spark.functions.urlnorm import normalize_url, sha1_hex

# --- universe ---------------------------------------------------------------
# Sized via env so the scaling bench can run a ~10^6-URL universe; read at
# import time so Spark python workers (which inherit the driver's env in
# local mode / via spark-submit --conf spark.executorEnv.*) agree with the
# driver. Set BEFORE SparkSession creation.

import os as _os

N_HOSTS = int(_os.environ.get("CRAWL_N_HOSTS", "40"))
PAGE_SCALE = int(_os.environ.get("CRAWL_PAGE_SCALE", "2000"))  # hottest host; host i has ~PAGE_SCALE/(i+1)

WORD_POOL = (
    "the quick crawl spider frontier fetch parse index rank link page host "
    "queue robots delay token budget bloom hash span text media image video "
    "audio depth score round batch seed graph"
).split()

SOCIAL_HOSTS = frozenset({"social00.example.com", "social01.example.com"})


@lru_cache(maxsize=1)
def hosts() -> list[str]:
    return [f"h{i:03d}.example.com" for i in range(N_HOSTS)]


@lru_cache(maxsize=1)
def host_pages() -> list[int]:
    return [max(20, PAGE_SCALE // (i + 1)) for i in range(N_HOSTS)]


@lru_cache(maxsize=1)
def _cum_pages() -> list[int]:
    out, acc = [], 0
    for p in host_pages():
        acc += p
        out.append(acc)
    return out


def total_pages() -> int:
    return _cum_pages()[-1]


def page_url(host_idx: int, page_idx: int) -> str:
    return f"https://{hosts()[host_idx]}/p/{page_idx}"


@dataclass(frozen=True)
class Page:
    url_norm: str
    url_hash: str
    fetch_status: str  # success | failed
    spans: tuple[tuple[str, str, str, int], ...]  # (kind, text, media_ref, offset)
    outlinks: tuple[str, ...]  # normalized URLs


def _pick_global(v: int) -> int:
    """Map an integer onto a host index, weighted by page count (Zipf)."""
    cum = _cum_pages()
    t = v % cum[-1]
    lo, hi = 0, len(cum) - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if t < cum[mid]:
            hi = mid
        else:
            lo = mid + 1
    return lo


def url_score(url_hash: str) -> float:
    """Priority score of a URL — closed form of its hash, identical no matter
    which parent discovered it."""
    return (int(url_hash[:8], 16) >> 2) % 10_000 / 10_000.0


def fetch_page(url_norm: str) -> Page:
    """Deterministic page for *url_norm* (must already be normalized)."""
    url_hash = sha1_hex(url_norm)
    hd = hashlib.sha1(url_norm.encode()).digest()
    h = int.from_bytes(hd[:8], "big")
    if h % 37 == 0:
        return Page(url_norm, url_hash, "failed", (), ())

    # spans: interleaved text + media (≈70/20/7/3 split like the reference's
    # media["images"|"videos"|"audios"] payload, triggers.py:221-226)
    n_spans = 3 + hd[8] % 8
    spans: list[tuple[str, str, str, int]] = []
    for s in range(n_spans):
        kb = hashlib.sha1(f"{url_norm}:s{s}".encode()).digest()
        sel = kb[0] % 10
        if sel < 7:
            n_words = 2 + kb[1] % 8
            words = [WORD_POOL[kb[2 + (i % 16)] % len(WORD_POOL)] for i in range(n_words)]
            spans.append(("text", " ".join(words), "", s))
        elif sel < 9:
            spans.append(("image", "", f"media://{url_hash[:16]}/img{s}", s))
        elif kb[1] % 2 == 0:
            spans.append(("video", "", f"media://{url_hash[:16]}/vid{s}", s))
        else:
            spans.append(("audio", "", f"media://{url_hash[:16]}/aud{s}", s))

    # outlinks: mostly same-host; 20% cross-host weighted by host size
    host = url_norm.split("://", 1)[1].split("/", 1)[0]
    _label = host.split(".", 1)[0]
    host_idx = int(_label[1:]) if _label[1:].isdigit() else 0
    n_out = hd[10] % 7
    links: list[str] = []
    for l in range(n_out):
        lb = hashlib.sha1(f"{url_norm}:l{l}".encode()).digest()
        v = int.from_bytes(lb[:4], "big")
        w = int.from_bytes(lb[4:8], "big")
        if lb[8] % 5 == 0:
            ti = _pick_global(v)
        else:
            ti = host_idx
        tj = w % host_pages()[ti]
        links.append(page_url(ti, tj))
    return Page(url_norm, url_hash, "success", tuple(spans), tuple(links))


def n_page_variants(url_norm: str) -> int:
    """How many interaction variants (scroll pages / load-more clicks) this
    page exposes beyond the base load — 0..2, closed-form of the hash
    (reference actions.py:8-215 scrolls until no new content / max steps)."""
    hd = hashlib.sha1(url_norm.encode()).digest()
    return hd[11] % 3


def fetch_page_variant(url_norm: str, variant: int) -> Page:
    """F4/F5 model (SURVEY §2.7): variant 0 is the base page; variant k > 0
    is the page state after k scroll/load-more actions — the same document
    extended with deterministically derived extra spans (appended at
    offsets after the base) and possibly extra outlinks revealed by the
    interaction. Variants beyond n_page_variants raise (the reference stops
    when no new content appears)."""
    base = fetch_page(url_norm)
    if variant == 0 or base.fetch_status == "failed":
        return base
    if variant > n_page_variants(url_norm):
        raise ValueError(f"page has only {n_page_variants(url_norm)} variants")
    spans = list(base.spans)
    links = list(base.outlinks)
    for k in range(1, variant + 1):
        kb = hashlib.sha1(f"{url_norm}:v{k}".encode()).digest()
        n_extra = 1 + kb[0] % 3
        for s in range(n_extra):
            off = len(spans)
            wb = hashlib.sha1(f"{url_norm}:v{k}:s{s}".encode()).digest()
            if wb[0] % 10 < 8:
                words = [WORD_POOL[wb[1 + (i % 16)] % len(WORD_POOL)] for i in range(3 + wb[2] % 6)]
                spans.append(("text", " ".join(words), "", off))
            else:
                spans.append(("image", "", f"media://{base.url_hash[:16]}/v{k}img{s}", off))
        if kb[3] % 2 == 0:  # load-more can reveal one extra link
            v = int.from_bytes(kb[4:8], "big")
            ti = _pick_global(v)
            links.append(page_url(ti, int.from_bytes(kb[8:12], "big") % host_pages()[ti]))
    return Page(base.url_norm, base.url_hash, "success", tuple(spans), tuple(links))


def gen_seeds(n: int = 64) -> list[str]:
    """Messy seed list over the universe: uppercase hosts, default ports,
    dot-segments, fragments — duplicates-after-normalization included
    (FIXTURES.md §2)."""
    seeds: list[str] = []
    for i in range(n):
        b = hashlib.sha1(f"seed:{i}".encode()).digest()
        hi = _pick_global(int.from_bytes(b[:4], "big"))
        pj = int.from_bytes(b[4:8], "big") % host_pages()[hi]
        clean = page_url(hi, pj)
        style = b[8] % 5
        if style == 0:
            messy = clean.replace("https://", "HTTPS://").replace(
                hosts()[hi], hosts()[hi].upper()
            )
        elif style == 1:
            messy = clean.replace(".example.com/", ".example.com:443/")
        elif style == 2:
            messy = clean.replace("/p/", "/x/../p/")
        elif style == 3:
            messy = clean + "#frag"
        else:
            messy = clean
        seeds.append(messy)
    return seeds


def robots_rows() -> list[dict]:
    """Synthetic per-host politeness config (reference config.yml:71,
    redisCache.py:85-89 analogs): crawl delay ⇒ per-round fetch budget;
    some hosts disallow a path prefix."""
    rows = []
    for i, h in enumerate(hosts()):
        delay = (0.5, 1.0, 2.0)[i % 3]
        budget = max(1, int(8 / delay / 2))  # 8, 4, 2 fetches/round (capacity)
        # half of the hosts refill slower than capacity — exercises the
        # token-bucket carry (reference TokenBucket: cap 10, refill 5/window)
        refill = budget if i % 2 else max(1, budget // 2)
        disallow = ["/p/9"] if i % 7 == 3 else []
        rows.append(
            {
                "host": h,
                "crawl_delay": delay,
                "rps_budget": float(refill),
                "max_tokens": budget,
                "disallow_rules": disallow,
            }
        )
    return rows


def is_disallowed(url_norm: str, rules: dict[str, list[str]]) -> bool:
    host = url_norm.split("://", 1)[1].split("/", 1)[0]
    path = "/" + url_norm.split("://", 1)[1].split("/", 1)[1] if "/" in url_norm.split("://", 1)[1] else "/"
    for prefix in rules.get(host, ()):
        if path.startswith(prefix):
            return True
    return False


def seed_frontier_rows(seed_urls: list[str]) -> list[dict]:
    """Normalize + dedup seed URLs into frontier rows (depth 0)."""
    seen: set[str] = set()
    rows = []
    for u in seed_urls:
        norm = normalize_url(u)
        uh = sha1_hex(norm)
        if uh in seen:
            continue
        seen.add(uh)
        rows.append(
            {
                "url": u,
                "url_norm": norm,
                "url_hash": uh,
                "depth": 0,
                "score": url_score(uh),
            }
        )
    return rows
