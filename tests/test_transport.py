"""HTTP fetch transport: golden parity vs the synthetic transport.

The crawl engine's fetch stage goes over a REAL wire (stdlib keep-alive
client pool → local threaded server rendering the synthetic web as HTML,
reference actions.py:218-293 / crawler_pool.py:25-49 shape) and must produce
byte-identical spans, crawl order, and seen set to the in-process synthetic
transport — plus fetch each URL over the wire exactly once (the optimistic
double-fetch path must auto-disable for a non-replayable transport,
ADVICE r2)."""

from __future__ import annotations

import pytest

from deepcrawl4ai_spark.frontier import webgraph as WG
from deepcrawl4ai_spark.frontier.engine import CrawlEngine, EngineConfig
from deepcrawl4ai_spark.frontier.fetcher import transport_replayable
from deepcrawl4ai_spark.frontier.htmlpage import parse_html, render_html
from deepcrawl4ai_spark.frontier.httpserver import SyntheticWebServer

N_SEEDS = 32
ROUNDS = 2
CFG = dict(global_budget=120, max_depth=3, max_attempts=2, record_order=True)


def test_html_roundtrip_identity():
    """render→parse recovers every successful page byte-for-byte (spans AND
    links) across a slice of the universe — the transport's losslessness."""
    checked = 0
    for hi in range(min(4, WG.N_HOSTS)):
        for pj in range(min(30, WG.host_pages()[hi])):
            page = WG.fetch_page(WG.page_url(hi, pj))
            if page.fetch_status != "success":
                continue
            back = parse_html(page.url_norm, page.url_hash, render_html(page))
            assert back.spans == page.spans, page.url_norm
            assert back.outlinks == page.outlinks, page.url_norm
            checked += 1
    assert checked > 50


def test_transport_replayability_flags():
    assert transport_replayable({"kind": "synthetic"})
    assert not transport_replayable({"kind": "http", "base": "http://x:1"})
    assert transport_replayable(
        {"kind": "http", "base": "http://x:1", "replayable": True}
    )


@pytest.fixture(scope="module")
def webserver():
    with SyntheticWebServer() as srv:
        yield srv


def _run(spark, tmp_path_factory, name: str, transport: dict | None):
    root = str(tmp_path_factory.mktemp(name))
    eng = CrawlEngine(
        spark, root, EngineConfig(max_rounds=ROUNDS, transport=transport, **CFG)
    )
    metrics = eng.run(WG.gen_seeds(N_SEEDS))
    return eng, metrics


def test_http_transport_golden_parity(spark, tmp_path_factory, webserver):
    base = {"kind": "http", "base": webserver.base}
    eng_h, m_h = _run(spark, tmp_path_factory, "http_store", base)
    eng_s, m_s = _run(spark, tmp_path_factory, "synth_store", {"kind": "synthetic"})

    # crawl order + round metrics byte-equal
    assert len(m_h) == len(m_s)
    for a, b in zip(m_h, m_s):
        assert a["crawl_order"] == b["crawl_order"]
        for k in ("urls_popped", "urls_fetched", "urls_failed", "new_frontier"):
            assert a[k] == b[k]

    # span sequences byte-equal per doc
    def spans_by_doc(eng):
        rows = eng.store.read(spark, "results").select("doc_id", "spans").collect()
        return {
            r["doc_id"]: tuple(
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in r["spans"]
            )
            for r in rows
        }

    sh, ss = spans_by_doc(eng_h), spans_by_doc(eng_s)
    assert sh == ss and len(sh) > 0

    # seen set equal
    seen = lambda eng: {  # noqa: E731
        r["url_hash"]
        for r in eng.store.read(spark, "frontier").select("url_hash").collect()
    }
    assert seen(eng_h) == seen(eng_s)

    # politeness audit: every popped URL hit the wire EXACTLY once — the
    # engine must not have taken the optimistic fetch-then-discard path
    # with a non-replayable transport
    total_popped = sum(m["urls_popped"] for m in m_h)
    assert webserver.n_requests == total_popped


def test_full_stack_http_robots_and_pages(spark, tmp_path_factory, webserver):
    """End-to-end wire crawl: the politeness dim is built from robots.txt
    bodies FETCHED over HTTP (distributed mapInPandas fill → REP parse →
    engine rows) and pages are fetched over HTTP too; the crawl byte-equals
    the all-synthetic run. Token-bucket refill is crawler config, not REP,
    so this runs the default (capacity-per-round) politeness mode."""
    from deepcrawl4ai_spark.frontier.fetcher import fetch_robots_rows

    transport = {"kind": "http", "base": webserver.base}
    rows = fetch_robots_rows(spark, WG.hosts(), transport)
    ref = {r["host"]: r for r in WG.robots_rows()}
    assert len(rows) == len(ref)
    for r in rows:
        assert r["max_tokens"] == ref[r["host"]]["max_tokens"]
        assert r["disallow_rules"] == ref[r["host"]]["disallow_rules"]

    root = str(tmp_path_factory.mktemp("fullstack"))
    eng = CrawlEngine(
        spark,
        root,
        EngineConfig(max_rounds=ROUNDS, transport=transport, **CFG),
        robots_rows=rows,
    )
    m_wire = eng.run(WG.gen_seeds(N_SEEDS))
    eng_s = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("fullstack_ref")),
        EngineConfig(max_rounds=ROUNDS, **CFG),
    )
    m_ref = eng_s.run(WG.gen_seeds(N_SEEDS))
    assert [m["crawl_order"] for m in m_wire] == [m["crawl_order"] for m in m_ref]
    assert [m["urls_popped"] for m in m_wire] == [m["urls_popped"] for m in m_ref]
