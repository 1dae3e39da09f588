"""Golden tests: Spark engine vs the pure-Python reference simulator
(SURVEY.md §5.2.2-4) — crawl order, URL-seen set, span-sequence equality,
and resume-after-kill without re-fetching (north_rule T7)."""

from __future__ import annotations

import pytest

from deepcrawl4ai_spark.frontier import webgraph as WG
from deepcrawl4ai_spark.frontier.engine import CrawlEngine, EngineConfig
from deepcrawl4ai_spark.frontier.simulator import SimConfig, simulate

N_SEEDS = 48
ROUNDS = 3
CFG = dict(global_budget=150, max_depth=3, max_attempts=2, record_order=True)


@pytest.fixture(scope="module")
def sim():
    return simulate(WG.gen_seeds(N_SEEDS), SimConfig(max_rounds=ROUNDS, **CFG))


@pytest.fixture(scope="module")
def engine_run(spark, tmp_path_factory, sim):
    root = str(tmp_path_factory.mktemp("crawlstore"))
    eng = CrawlEngine(spark, root, EngineConfig(max_rounds=ROUNDS, **CFG))
    metrics = eng.run(WG.gen_seeds(N_SEEDS))
    return eng, metrics


def test_crawl_order_equality(engine_run, sim):
    _, metrics = engine_run
    assert len(metrics) == len(sim.crawl_order)
    for i, m in enumerate(metrics):
        assert m["crawl_order"] == sim.crawl_order[i], f"round {i} order differs"


def test_round_metrics_equality(engine_run, sim):
    _, metrics = engine_run
    keys = (
        "urls_popped urls_fetched urls_failed outlinks_seen dedup_dropped new_frontier"
    ).split()
    for i, m in enumerate(metrics):
        for k in keys:
            assert m[k] == sim.round_metrics[i][k], f"round {i} {k}"


def test_seen_set_equality(engine_run, sim, spark):
    eng, _ = engine_run
    frontier = eng.store.read(spark, "frontier")
    eng_seen = {r["url_hash"] for r in frontier.select("url_hash").collect()}
    assert eng_seen == sim.seen


def test_span_sequence_equality(engine_run, sim, spark):
    """Per doc_id: (kind, text, media_ref, offset) sequence byte-equal
    (BASELINE.json input_hint per-row invariant)."""
    eng, _ = engine_run
    results = eng.store.read(spark, "results")
    rows = results.select("doc_id", "spans").collect()
    assert len(rows) == len(sim.results)
    for row in rows:
        page = sim.results[row["doc_id"]]
        got = tuple(
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]
        )
        assert got == page.spans, f"spans differ for {row['doc_id']}"


def test_frontier_states_consistent(engine_run, sim, spark):
    eng, _ = engine_run
    frontier = eng.store.read(spark, "frontier")
    eng_states = {
        r["url_hash"]: r["state"] for r in frontier.select("url_hash", "state").collect()
    }
    sim_states = {h: e.state for h, e in sim.frontier.items()}
    assert eng_states == sim_states


def test_resume_without_refetch(spark, tmp_path_factory, sim):
    """Kill after round 1 (drop the loop), restart with a fresh engine object:
    the run continues from the checkpoint and the final state equals an
    uninterrupted run — zero re-fetches (rounds table has one row per round)."""
    root = str(tmp_path_factory.mktemp("resume"))
    seeds = WG.gen_seeds(N_SEEDS)
    eng1 = CrawlEngine(spark, root, EngineConfig(max_rounds=2, **CFG))
    m1 = eng1.run(seeds)
    assert len(m1) == 2

    eng2 = CrawlEngine(spark, root, EngineConfig(max_rounds=ROUNDS, **CFG))
    m2 = eng2.run()  # no seeds — resumes from checkpoint
    assert len(m2) == ROUNDS - 2
    assert m2[0]["round"] == 2

    rounds = eng2.store.read(spark, "rounds")
    per_round = {r["round"]: r["urls_popped"] for r in rounds.collect()}
    assert sorted(per_round) == list(range(ROUNDS))  # no duplicate rounds

    for i, m in enumerate(m2):
        assert m["crawl_order"] == sim.crawl_order[2 + i]
    frontier = eng2.store.read(spark, "frontier")
    eng_seen = {r["url_hash"] for r in frontier.select("url_hash").collect()}
    assert eng_seen == sim.seen


def test_page_variants_model(spark):
    """F4/F5 (SURVEY §2.7 model): multi-fetch fan-out with a page_variant
    column (reference actions.py:8-215 scroll/load-more). Variant 0 equals
    the base fetch byte-for-byte; each later variant extends the span
    sequence monotonically (interaction adds content, never rewrites it)."""
    from deepcrawl4ai_spark.frontier.fetcher import run_fetch_variants

    urls = []
    for pj in range(WG.host_pages()[0]):
        u = WG.page_url(0, pj)
        if WG.fetch_page(u).fetch_status == "success" and WG.n_page_variants(u) >= 1:
            urls.append(u)
        if len(urls) >= 5:
            break
    assert urls, "universe has no multi-variant pages"
    rows = [(WG.sha1_hex(u), u, "h000.example.com", 0, 0.5, 0) for u in urls]
    df = spark.createDataFrame(
        rows,
        "url_hash string, url_norm string, host string, depth int,"
        " score double, attempt int",
    )
    by_url: dict[str, dict[int, tuple]] = {}
    for r in run_fetch_variants(df).collect():
        by_url.setdefault(r["url_norm"], {})[r["page_variant"]] = tuple(
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        )
    for u in urls:
        vs = by_url[u]
        assert set(vs) == set(range(WG.n_page_variants(u) + 1))
        assert vs[0] == WG.fetch_page(u).spans  # base load unchanged
        for v in range(1, len(vs)):
            assert vs[v][: len(vs[v - 1])] == vs[v - 1]  # monotone extension
            assert len(vs[v]) > len(vs[v - 1])
            assert [s[3] for s in vs[v]] == list(range(len(vs[v])))  # offsets


def test_submit_seeds_idempotent(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idem"))
    eng = CrawlEngine(spark, root, EngineConfig(max_rounds=1, **CFG))
    eng.submit_seeds(WG.gen_seeds(8))
    before = eng.store.read(spark, "frontier").count()
    eng.submit_seeds(WG.gen_seeds(16))  # ignored — checkpoint exists
    assert eng.store.read(spark, "frontier").count() == before
