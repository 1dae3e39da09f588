"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS], plus a frontier-crawl throughput bench.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "urls_per_sec": ..., "frontier_rounds": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "o1_priority_topk",
    "o2_round_budget",
    "j4_broadcast_lookup",
    "j3_exact_antijoin",
    "a1_success_fail_counts",
    "p1_url_normalize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "ann_topk_cosine",
    "ann_lsh_topk",
    "text_fingerprint",
    "c3_bm25_rank",
]

# round-2/3 operators, timed AFTER the headline window so `value` stays
# comparable across rounds; reported under "extras"
EXTRAS = [
    "asof_join_events",
    "sessionize_native",
    "dedup_simhash_banded",
    "host_pagerank",
    "pack_sequences",
    "c7_css_selectors",
    "c2_dynamic_pruning",
    "dedup_paragraphs",
    "ann_ivf_topk",
    "decontaminate_apply",
    "a9_percentiles_approx",
    # round-4/5 operators
    "text_repetition_filter",
    "text_pii_mask",
    "sample_quality_weighted",
    "shard_shuffle",
    "corpus_pipeline",
    "media_features",
    "text_unigram_logprob",
    "ann_recall_panel",
    "dedup_recall_minhash",
    "bpe_merges",
    # late round-5 operators
    "bpe_encode",
    "dedup_paragraphs_apply",
    "dedup_substring_spans",
    "dedup_substring_apply",
    "sample_domain_mix",
    "ann_pq_topk",
    "ann_recall_pq",
    "dedup_recall_minhash16",
    "sample_source_cap",
    "media_phash_dedup",
    "text_tfidf_topk",
    "a10_event_funnel",
    "j6_range_join",
    "a11_hypertable_rollup",
    "pack_sequences_bpe",
    # r06: separable-regime recall measurements (SF-independent fixture)
    "ann_recall_clustered",
    "ann_recall_pq_clustered",
    # r06 batch 2: HITS, temperature sampling, HLL accuracy gate
    "host_hits",
    "sample_temperature",
    "a12_distinct_users_hll",
    # r06 batch 3: CCNet perplexity cut, minhash apply twin, SemDeDup
    "sample_perplexity_buckets",
    "dedup_minhash_apply",
    "dedup_semantic",
    # r06 batch 4: DSIR selection, winnowing fingerprints, entropy gate
    "sample_dsir",
    "text_winnow_fingerprint",
    "text_entropy_filter",
    "corpus_pipeline_v2",
    # r06 batch 6: composed IVF+PQ index, winnowing match step
    "ann_ivfpq_topk",
    "dedup_winnow_pairs",
    "search_hybrid_rrf",
    "text_bigram_logprob",
    # r07: DCLM-style learned gate, the v3 funnel, SemDeDup on trained cells
    "quality_classifier",
    "corpus_pipeline_v3",
    "dedup_semantic_trained",
]

FRONTIER_SEEDS = 2000
FRONTIER_ROUNDS = 3
FRONTIER_BUDGET = 4000
FRONTIER_BUDGET_SCALE = 10
# universe sizing — read by webgraph at import; must be set before the
# SparkSession exists so python workers agree
os.environ.setdefault("CRAWL_N_HOSTS", "100")
os.environ.setdefault("CRAWL_PAGE_SCALE", "10000")


def _force(df) -> int:
    """Fully execute the plan without driver materialization."""
    return df.write.format("noop").mode("overwrite").save() or 0


def main() -> None:
    import importlib.util as _ilu

    _spec = _ilu.spec_from_file_location(
        "cpu_ceiling", os.path.join(REPO, "tools", "cpu_ceiling.py")
    )
    _ceil = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_ceil)
    # same-epoch hypervisor-steal snapshot BEFORE the suite (VERDICT r4 #2):
    # run before the JVM exists so the probe owns the box
    ceiling_before = _ceil.quick_probe()

    from deepcrawl4ai_spark.registry import QUERIES
    from deepcrawl4ai_spark.session import get_spark

    spark = get_spark("bench", cores=CPUS, shuffle_partitions=max(CPUS, 16))

    # untimed warmup: JIT/codegen + parquet footer cache + python/Arrow
    # workers (one per core — the F8 warm-up analog), so the first timed
    # query measures the operator, not session cold-start
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(SF_DIR, "nation.parquet")).count()
    from deepcrawl4ai_spark.frontier.fetcher import warm_pool

    warm_pool(spark)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    per_query: dict[str, float] = {}
    t_suite = time.time()
    for name in HEADLINE:
        t0 = time.time()
        _force(QUERIES[name](spark, SF_DIR))
        per_query[name] = round(time.time() - t0, 3)

    # frontier throughput: urls fetched / sec over a bounded crawl
    from deepcrawl4ai_spark.frontier import webgraph as WG
    from deepcrawl4ai_spark.frontier.engine import CrawlEngine, EngineConfig

    store = tempfile.mkdtemp(prefix="benchstore_")
    try:
        eng = CrawlEngine(
            spark,
            store,
            EngineConfig(
                global_budget=FRONTIER_BUDGET,
                max_rounds=FRONTIER_ROUNDS,
                max_depth=4,
                budget_scale=FRONTIER_BUDGET_SCALE,
                record_order=False,
            ),
        )
        t0 = time.time()
        metrics = eng.run(WG.gen_seeds(FRONTIER_SEEDS))
        frontier_sec = time.time() - t0
        fetched = sum(m["urls_fetched"] for m in metrics)
        per_query["frontier_crawl"] = round(frontier_sec, 3)
        urls_per_sec = round(fetched / frontier_sec, 2) if frontier_sec else 0.0
    finally:
        shutil.rmtree(store, ignore_errors=True)

    total = round(time.time() - t_suite, 3)
    extras: dict[str, float] = {}
    for name in EXTRAS:
        t0 = time.time()
        _force(QUERIES[name](spark, SF_DIR))
        extras[name] = round(time.time() - t0, 3)
    spark.stop()
    # matching snapshot AFTER the suite, once the JVM is gone — a clean epoch
    # shows ~1.0/1.0; a steal-polluted one is visibly depressed on both ends
    ceiling_after = _ceil.quick_probe()
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "extras": extras,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "urls_per_sec": urls_per_sec,
                "frontier_rounds": FRONTIER_ROUNDS,
                "cpus": CPUS,
                "ceiling_before": ceiling_before,
                "ceiling_after": ceiling_after,
            }
        )
    )


if __name__ == "__main__":
    main()
