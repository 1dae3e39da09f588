"""Physical-plan audit: verify the plans we promised (pushdown, broadcast,
codegen, no driver-side sorts) and write the evidence to PLANS.md.

Checks per query:
- PushedFilters / ReadSchema reach the parquet scan (column pruning)
- dimension joins are BroadcastHashJoin
- hot-path queries run inside WholeStageCodegen
- frontier selection has no global Sort without a partition bound
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"

# NOTE: pre-execution AQE plans don't render WholeStageCodegen spans;
# "Batched: true" asserts the vectorized parquet scan path instead.
CHECKS = {
    "tpch_q1": ["PushedFilters: [IsNotNull(l_shipdate)", "Batched: true", "ReadSchema"],
    "tpch_q3": ["BroadcastHashJoin", "PushedFilters"],
    "j4_broadcast_lookup": ["BroadcastHashJoin"],
    "j3_exact_antijoin": ["BroadcastHashJoin LeftAnti", "PushedFilters"],
    "o1_priority_topk": ["WindowGroupLimit", "Batched: true"],
    "a1_success_fail_counts": ["HashAggregate", "Batched: true"],
    "dedup_minhash_lsh": ["HashAggregate"],
    "c2_span_pruning": ["Batched: true"],
    # round-2 additions: IVF search broadcasts centroids + query side and
    # group-limits both windows; selector inference is pure aggregation;
    # LSH-blocked near-dup stays on the vectorized scan path
    "ann_ivf_topk": ["BroadcastHashJoin", "WindowGroupLimit"],
    "c7_selector_inference": ["HashAggregate", "Batched: true"],
    # r8: the hyperplane-signature pass is localCheckpointed before the
    # bucket self-join (both sides read it), so the audited plan starts at
    # the checkpoint scan; the signature chain's scan shape stays pinned
    # via ann_lsh_buckets-family rows that keep it inline
    "dedup_embedding_lsh": ["!CartesianProduct"],
    # round-2 additions: the temporal family must stay single-shuffle —
    # as-of's filter pushes to the scan and the union feeds ONE window;
    # sessionize's groupBy reuses the window's user_id partitioning (the
    # aggregate needs only a subset-clustered distribution, so exactly one
    # Exchange in the whole plan); the splitter and the variant model are
    # shuffle-free projections.
    "asof_join_events": ["Window", "PushedFilters: [IsNotNull(event_type)", "Batched: true"],
    "sessionize_events": ["Window", "HashAggregate", "!Exchange hashpartitioning(user_id#<N>, session_idx"],
    "train_split_docs": ["Batched: true", "!Exchange"],
    "f5_load_more_clicks": ["Batched: true", "!Exchange"],
    "f4_scroll_variants": ["Batched: true", "!Exchange"],
    # r8: the 32-plane signature agg is localCheckpointed before the band
    # self-join; the post-checkpoint plan keeps the band-join + distinct
    # partial-agg shape
    "dedup_simhash_banded": ["HashAggregate", "!CartesianProduct"],
    # corpus shaping: the packer is one window shuffle on lang; the
    # stratified sampler is a pure scan-side filter (no shuffle at all)
    "pack_sequences": ["Window", "Batched: true"],
    "sample_stratified": ["Batched: true", "!Exchange"],
    # PageRank: each iteration's rank-to-edges join broadcasts the tiny
    # side; contributions partial-agg before the dst shuffle
    "host_pagerank": ["BroadcastHashJoin", "HashAggregate"],
    # chunk plan is a pure projection; cluster labels iterate join+min-agg
    "c4_chunk_plan": ["Batched: true", "!Exchange"],
    "dedup_clusters_lp": ["HashAggregate"],
    # round-3 additions: selector inference is a shuffle-free Arrow map over
    # the scan; dynamic pruning is pure scan-side arithmetic (no shuffle)
    "c7_css_selectors": ["MapInPandas", "Batched: true", "!Exchange"],
    "c2_dynamic_pruning": ["Batched: true", "!Exchange"],
    # paragraph dedup: one shuffle on the paragraph hash (partial-agg
    # count-distinct), NEVER a pair join; gopher rules are scan-side only
    "dedup_paragraphs": ["HashAggregate", "Batched: true", "!CartesianProduct"],
    "text_gopher_rules": ["Batched: true", "!Exchange"],
    # k-means Lloyd step: centroids broadcast to every vector (the small
    # side of the assign), then one partial-agg shuffle on (cid, dim)
    "ann_kmeans_update": ["Broadcast", "HashAggregate", "WindowGroupLimit"],
    "a9_value_percentiles": ["HashAggregate", "Batched: true"],
    # round-4 additions: contamination removal broadcasts the tiny eval gram
    # set and never forms a pair space; the sketch-percentile twin is a
    # straight partial-agg panel on the vectorized scan
    "decontaminate_apply": ["BroadcastHashJoin", "HashAggregate", "!CartesianProduct"],
    "a9_percentiles_approx": ["HashAggregate", "Batched: true"],
    # repetition stats are two partial-agg groupBys (no pair space); PII
    # masking is a pure scan-side regexp projection — zero shuffles
    "text_repetition_filter": ["HashAggregate", "Batched: true", "!CartesianProduct"],
    "text_pii_mask": ["Batched: true", "!Exchange"],
    # quality-weighted sampling is scan-side only; shard shuffle is exactly
    # one hash-partitioned window (per-shard sort, never global)
    "sample_quality_weighted": ["Batched: true", "!Exchange"],
    "shard_shuffle": ["Window", "Batched: true"],
    # round-5: the end-to-end corpus funnel must stay shuffle-bounded. The
    # shared flags frame is localCheckpointed (r5 ADVICE — eager materialize
    # + ContextCleaner reclaim instead of a leaked persist), so the audited
    # plan of the RETURNED manifest starts at the checkpoint boundary: the
    # post-checkpoint stages (funnel agg, pack/shard windows, 1-row counts
    # cross-broadcast) are visible here; the pre-checkpoint gate/dedup joins
    # are audited via their standalone registered queries (text_gopher_rules,
    # text_repetition_filter, dedup_paragraphs, sample_quality_weighted).
    "corpus_pipeline": [
        "HashAggregate",
        "Window",
        "BroadcastNestedLoopJoin Cross",
        "!CartesianProduct",
        "!SortMergeJoin",
    ],
    # recall panel composes three broadcast+WindowGroupLimit searches; the
    # minhash recall query's truth side is the tagged all-pairs baseline by
    # design (it exists to measure the twin against it) — only assert the
    # aggregates are partial-agg shaped
    "ann_recall_panel": ["Broadcast", "WindowGroupLimit", "!CartesianProduct"],
    "dedup_recall_minhash": ["HashAggregate"],
    # unigram LM gate: vocab partial-agg + broadcast probability join +
    # per-doc fold — two bounded shuffles, no window, no pair space
    "text_unigram_logprob": ["HashAggregate", "BroadcastHashJoin", "!CartesianProduct"],
    # BPE induction: iterative — each step's pair count is a partial-agg
    # over the checkpointed vocab dict and the 1-row argmax is fetched
    # driver-side (TakeOrdered) then applied as a literal replace, so the
    # FINAL merge-table plan is a driver-built LocalTableScan; the per-step
    # shapes live in the step builders (_bpe_pairs: one partial-agg
    # shuffle) and the plan-depth constancy hook in tests/test_iterative.py
    "bpe_merges": ["!CartesianProduct", "!SortMergeJoin"],
    # late r5: paragraph-dedup APPLY keeps the detection's one-shuffle shape
    # (keeper election = min-struct partial agg on ph, join back on ph, per-
    # doc reassembly agg) — never a pair space; substring spans add exactly
    # one per-doc window (island grouping) on top of the shingle-hash agg
    "dedup_paragraphs_apply": ["HashAggregate", "Batched: true", "!CartesianProduct"],
    "dedup_substring_spans": ["Window", "HashAggregate", "!CartesianProduct"],
    # mixture rebalancing: per-source rates are a tiny broadcast dim over the
    # scan-side draw filter — the corpus itself never shuffles
    "sample_domain_mix": ["BroadcastHashJoin", "Batched: true", "!SortMergeJoin"],
    # BPE encode: the post-merge dict (checkpointed by the learn loop) joins
    # the exploded corpus BROADCAST, then one per-doc partial agg
    "bpe_encode": ["BroadcastHashJoin", "HashAggregate", "!CartesianProduct"],
    # PQ search: codebooks + ADC distance tables broadcast, encoding and the
    # ADC fold are partial aggs, top-k is a group-limited window — the
    # compressed-domain scan never joins corpus×corpus
    "ann_pq_topk": [
        "BroadcastHashJoin",
        "HashAggregate",
        "WindowGroupLimit",
        "!CartesianProduct",
    ],
    # 16-perm recall lever: truth side is the tagged all-pairs baseline by
    # design; assert the pipeline sides stay partial-agg shaped
    "dedup_recall_minhash16": ["HashAggregate"],
    "ann_recall_pq": ["WindowGroupLimit", "HashAggregate", "BroadcastHashJoin"],
    # ExactSubstr cut: same covered-position machinery as decontaminate_apply
    # pointed at corpus self-duplicates — keeper election and dup filter are
    # partial aggs on the shingle hash, the word anti-join never pairs docs
    "dedup_substring_apply": ["HashAggregate", "Batched: true", "!CartesianProduct"],
    # per-domain cap: exactly one WindowGroupLimit on the source key;
    # mixture rebalancing: tiny broadcast rate dim over the scan-side draw
    "sample_source_cap": ["WindowGroupLimit", "Batched: true"],
    # media pHash near-dup: Arrow-batched featurize, then the banded-join
    # plan (simhash_banded shape) — never an unbanded media×media pair space
    "media_phash_dedup": ["MapInPandas", "!CartesianProduct"],
    # tf-idf keywords: tf/df partial aggs, vocab dim broadcast back, top-k
    # group-limited; funnel: event_type predicates reach the parquet scan,
    # every stage a user-keyed partial agg
    "text_tfidf_topk": ["WindowGroupLimit", "BroadcastHashJoin", "HashAggregate"],
    "a10_event_funnel": ["PushedFilters", "HashAggregate", "!CartesianProduct"],
    # range join: equi on the bounding key + interval predicate — never a
    # pure cross product; hypertable rollup is one scan-side-keyed partial agg
    "j6_range_join": ["PushedFilters", "HashAggregate", "!CartesianProduct"],
    "a11_hypertable_rollup": ["HashAggregate", "Batched: true"],
    # tokenize-then-pack composition: the per-doc token frame joins back on
    # doc_id and ONE lang-partitioned running-sum window assigns shards
    "pack_sequences_bpe": ["Window", "!CartesianProduct"],
    # r06 clustered-fixture recall rows: every search is broadcast-candidate
    # + WindowGroupLimit; the only cross join is the tagged brute-force
    # truth side (broadcast of the 10-query dim, never shuffled pair space)
    "ann_recall_clustered": ["Broadcast", "WindowGroupLimit", "!CartesianProduct"],
    "ann_recall_pq_clustered": ["Broadcast", "HashAggregate", "!CartesianProduct"],
    # r06 batch 2: HITS — per half-iteration the edge join broadcasts the
    # tiny score side and contributions partial-agg (the pagerank shape);
    # temperature sampling is the domain_mix shape (tiny rate dim broadcast
    # back over a scan-side filter, no corpus shuffle); the HLL gate is one
    # partial agg over the vectorized scan
    # host_hits materializes per-iteration localCheckpoints (six unrolled
    # half-steps each read their input twice — unmaterialized, the lineage
    # recomputes the base 2^6 times), so the returned frame's plan is the
    # truncated checkpoint scan; the per-iteration join+partial-agg shape
    # is pinned instead by tests/test_iterative.py (host_hits ==
    # hits_fixpoint(3) equality + the plan-depth constancy hook)
    "host_hits": ["!CartesianProduct"],
    "sample_temperature": ["BroadcastHashJoin", "Batched: true", "!SortMergeJoin"],
    "a12_distinct_users_hll": ["HashAggregate", "Batched: true"],
    # r06 batch 3: the CCNet tercile cut is ONE lang-partitioned window on
    # top of the unigram scorer's broadcast-join fold; the minhash APPLY
    # twin inherits the clusters_lp shape (band equi-join -> verify -> 3
    # Pregel hops, partial-agg each); SemDeDup blocks the pair space per
    # centroid cell — the pair join must stay an equi-join on cid (hash or
    # sort-merge), never a cartesian product
    "sample_perplexity_buckets": ["Window", "BroadcastHashJoin", "HashAggregate"],
    "dedup_minhash_apply": ["HashAggregate", "!CartesianProduct"],
    # (keeper election is a struct-min -> SortAggregate, not hash-able)
    # r8: the assignment is localCheckpointed before the per-cell self-join
    # (the _ivf_recall_panel_from fix — the uncached shape evaluated the
    # broadcast-argmax subtree on BOTH sides of the pair join), so the
    # audited plan starts at the checkpoint scan: 'Batched: true' moved
    # behind the truncation; the assignment chain's shape stays pinned via
    # ann_kmeans_update / ann_ivf_topk (same Broadcast + WindowGroupLimit)
    "dedup_semantic": ["SortAggregate", "!CartesianProduct",
                       "!BroadcastNestedLoopJoin Inner"],
    # r06 batch 4: DSIR is the unigram-scorer shape (one vocab partial agg,
    # broadcast probability join, per-doc fold); winnowing is scan-side gram
    # hashing + one doc-partitioned window + distinct; the entropy gate is
    # two partial aggs over the vectorized scan
    "sample_dsir": ["HashAggregate", "BroadcastHashJoin", "!CartesianProduct"],
    "text_winnow_fingerprint": ["Window", "HashAggregate", "Batched: true"],
    # r8: the entropy gate is now single-pass — the per-doc char total is a
    # doc_id-partitioned window over the (doc_id, char) partial agg and the
    # entropy fold reuses that partitioning (one corpus explode, two
    # shuffles; the old agg+join+join shape re-read the explode 3×), so
    # Window is now REQUIRED rather than forbidden
    "text_entropy_filter": ["HashAggregate", "Window", "Batched: true"],
    # r06 batch 5: the v2 funnel — windows (perplexity cut + packing),
    # broadcast prob/total joins, the 1-row counts cross join; the minhash
    # band self-join inside the dedup stage may sort-merge, so unlike v1
    # SMJ is not forbidden here
    "corpus_pipeline_v2": [
        "HashAggregate",
        "Window",
        "BroadcastNestedLoopJoin Cross",
        "!CartesianProduct",
    ],
    # r06 batch 6: IVFPQ = the PQ shape (broadcast codebooks/dtable,
    # min-struct encode, WindowGroupLimit top-k) with the coarse cell as an
    # extra broadcast equi-join key; winnow pairs = postings equi-join on
    # fp_hash + one pair partial-agg on top of the fingerprint window
    "ann_ivfpq_topk": [
        "BroadcastHashJoin",
        "HashAggregate",
        "WindowGroupLimit",
        "!CartesianProduct",
    ],
    # r8: the winnowing fingerprint chain is localCheckpointed before the
    # postings self-join; its Window shape stays pinned inline via
    # text_winnow_fingerprint
    "dedup_winnow_pairs": ["HashAggregate", "!CartesianProduct"],
    # r06 batch 7: hybrid RRF — each ranker truncates via orderBy+limit
    # (TakeOrderedAndProject: distributed partial top-K, no global sort);
    # the query-vector side is the usual 1-row broadcast cross
    "search_hybrid_rrf": [
        "TakeOrderedAndProject",
        "BroadcastNestedLoopJoin Cross",
        "!CartesianProduct",
    ],
    # r06 batch 8: bigram LM — the probability dim is corpus-sized, so it
    # must NEVER be broadcast; the operator pins the shape with explicit
    # shuffle_hash hints (ADVICE r6), letting us assert it positively at
    # audit SF instead of only forbidding the nested-loop variant
    "text_bigram_logprob": ["HashAggregate", "ShuffledHashJoin",
                            "!CartesianProduct", "!BroadcastNestedLoopJoin",
                            "!BroadcastHashJoin"],
    # r07: DCLM-style learned quality gate — the 64-row gradient dim and the
    # 1-row totals must be broadcast (explicit F.broadcast + cross), the only
    # corpus shuffle is the (doc_id, bucket) feature agg; a sort-merge join
    # anywhere means the dim broadcast regressed
    "quality_classifier": [
        "HashAggregate",
        "BroadcastHashJoin",
        "BroadcastNestedLoopJoin Cross",
        "!CartesianProduct",
        "!SortMergeJoin",
    ],
    # r07: v3 funnel — same shape promises as v2 (the clusters_lp stage may
    # sort-merge its band self-join, so SMJ is not forbidden); the flags
    # frame is localCheckpointed mid-plan, so needles only see the
    # temperature + packing tail plus the counts broadcasts
    "corpus_pipeline_v3": [
        "HashAggregate",
        "Window",
        "BroadcastNestedLoopJoin Cross",
        "!CartesianProduct",
    ],
    # r07: SemDeDup on trained cells — the Lloyd step is one (cid, dim)
    # partial agg + a k-row centroid rebuild, both broadcast back over the
    # scan for the reassignment cross; the per-cell pair join must stay an
    # equi-join on cid (keeper election is the struct-min SortAggregate,
    # same as dedup_semantic). r8: the trained assignment is
    # localCheckpointed before the self-join (VERDICT r7 #2 — the uncached
    # shape ran the Lloyd step TWICE), so the Lloyd partial-agg and the
    # reassignment cross sit behind the truncation; that chain's shape
    # stays pinned via ann_kmeans_update
    "dedup_semantic_trained": [
        "SortAggregate",
        "!CartesianProduct",
        "!BroadcastNestedLoopJoin Inner",
    ],
}


def main() -> None:
    from deepcrawl4ai_spark.registry import QUERIES
    from deepcrawl4ai_spark.session import get_spark

    # --check (VERDICT r5 #2): regenerate and FAIL if the result differs
    # from the committed PLANS.md — staleness becomes impossible to ship.
    check_only = "--check" in sys.argv

    spark = get_spark("plan_audit", cores=4, shuffle_partitions=8)
    lines = [
        "# PLANS — physical-plan audit evidence",
        "",
        "Generated by tools/audit_plans.py. Each query's `.explain('formatted')`",
        "is checked for the physical properties the 100 TB design requires.",
        "",
    ]
    failures = 0
    for name, needles in CHECKS.items():
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        lines.append(f"## {name}")
        for needle in needles:
            negate = needle.startswith("!")
            probe = needle[1:] if negate else needle
            # '#<N>' in a needle matches Catalyst's exprId suffix (#123)
            probe_pat = r"[\s\S]{0,40}?".join(
                re.escape(p).replace(r"\#\<N\>", r"#\d+") for p in probe.split(" ")
            )
            ok = bool(re.search(probe_pat, plan))
            if negate:
                ok = not ok
            mark = "ok " if ok else "MISSING"
            if not ok:
                failures += 1
            lines.append(f"- [{mark}] expects `{needle}`")
        # evidence: scan + join lines only (keep the doc readable)
        interesting = [
            ln
            for ln in plan.splitlines()
            if re.search(r"PushedFilters|ReadSchema|Broadcast|WindowGroupLimit|AdaptiveSparkPlan", ln)
        ][:8]
        lines.append("")
        lines.append("```")
        # scrub session-varying counters (plan_id, Catalyst exprIds) so the
        # committed file is byte-stable across regens (--check depends on it)
        # scrub FIRST, truncate AFTER (ADVICE r6): exprId digit-width drift
        # (#987 vs #1023) must not shift the truncation point, or --check
        # reports a spurious STALE across sessions
        lines.extend(
            re.sub(r"#\d+", "#N", re.sub(r"plan_id=\d+", "plan_id=N", ln.strip()))[:160]
            for ln in interesting
        )
        lines.append("```")
        lines.append("")
    out = "\n".join(lines)
    path = os.path.join(REPO, "PLANS.md")
    if check_only:
        committed = open(path).read() if os.path.exists(path) else ""
        stale = committed != out
        print(
            f"PLANS.md --check: {'STALE (regen differs from committed)' if stale else 'up to date'};"
            f" {failures} missing expectations"
        )
        spark.stop()
        sys.exit(1 if (failures or stale) else 0)
    with open(path, "w") as f:
        f.write(out)
    print(f"PLANS.md written; {failures} missing expectations")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
