"""Convergence-loop variants of the iterative operators (VERDICT r2 #3):
fixpoint result equals the unrolled oracle-checked variant on the test
corpus, the loop actually terminates by convergence (not max_iters), and
localCheckpoint lineage truncation keeps per-iteration plan depth CONSTANT."""

from __future__ import annotations

from pyspark.sql import functions as F

from deepcrawl4ai_spark.operators.dedup import (
    dedup_clusters_lp,
    dedup_minhash_verified,
    label_propagation_fixpoint,
)
from deepcrawl4ai_spark.operators.graph import (
    hits_fixpoint,
    host_hits,
    host_pagerank,
    pagerank_fixpoint,
)
from deepcrawl4ai_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _edges(spark):
    orders = load_table(spark, SF, "orders")
    return orders.select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 10)).alias("src"),
        F.concat(F.lit("h"), (F.col("o_orderkey") % 13)).alias("dst"),
    ).distinct()


def test_pagerank_fixpoint_matches_unrolled(spark):
    """max_iters=3, tol=0 reproduces the unrolled-3 oracle query exactly."""
    unrolled = {
        r["host"]: r["rank"] for r in host_pagerank(spark, SF).collect()
    }
    ranks, iters = pagerank_fixpoint(_edges(spark), max_iters=3, tol=0.0)
    assert iters == 3
    got = {
        r["host"]: r["rank"]
        for r in ranks.select("host", F.round("rank", 6).alias("rank")).collect()
    }
    assert got == unrolled


def test_pagerank_converges_with_constant_plan_depth(spark):
    depths: list[int] = []
    ranks, iters = pagerank_fixpoint(
        _edges(spark), max_iters=60, tol=1e-10, plan_depths=depths
    )
    assert iters < 60, "did not converge by tolerance"
    assert iters >= 5  # tolerance that tight needs several hops
    # lineage truncation: every iteration's pre-checkpoint plan is the same
    # size — no growth with iteration count
    assert len(set(depths[1:])) == 1, depths
    total = ranks.agg(F.sum("rank")).head()[0]
    assert 0.0 < total <= 1.0 + 1e-9  # dangling mass dropped, floor retained


def test_hits_fixpoint_matches_unrolled(spark):
    """max_iters=3, tol=0 reproduces the unrolled-3 host_hits query."""
    unrolled = {
        r["host"]: (r["auth"], r["hub"]) for r in host_hits(spark, SF).collect()
    }
    auth, hub, iters = hits_fixpoint(_edges(spark), max_iters=3, tol=0.0)
    assert iters == 3
    got_a = {r["host"]: r["s"] for r in auth.collect()}
    got_h = {r["host"]: r["s"] for r in hub.collect()}
    got = {h: (round(got_a[h], 6), round(got_h[h], 6)) for h in got_a}
    assert got == unrolled


def test_hits_converges_with_constant_plan_depth(spark):
    depths: list[int] = []
    auth, hub, iters = hits_fixpoint(
        _edges(spark), max_iters=60, tol=1e-10, plan_depths=depths
    )
    assert iters < 60, "did not converge by tolerance"
    # ≥2: the first delta is only measurable on the second iteration (the
    # dense near-regular test graph mixes fast, so 2 can be enough)
    assert iters >= 2
    assert len(set(depths[1:])) == 1, depths
    # L1 normalization: both score vectors sum to 1 at the fixpoint
    for df in (auth, hub):
        total = df.agg(F.sum("s")).head()[0]
        assert abs(total - 1.0) < 1e-9


def test_clusters_fixpoint_matches_unrolled_and_converges(spark):
    """The fixpoint labels equal the unrolled-3 labels on the test corpus
    (tiny dup clusters converge within 3 hops), terminating by zero-change."""
    unrolled = {
        r["doc_id"]: r["cluster"]
        for r in dedup_clusters_lp(spark, SF).collect()
    }
    docs = load_table(spark, SF, "documents").select("doc_id")
    pairs = dedup_minhash_verified(spark, SF).select("doc1", "doc2")
    depths: list[int] = []
    labels, iters = label_propagation_fixpoint(
        docs, pairs, max_iters=20, plan_depths=depths
    )
    assert iters < 20, "did not converge"
    got = {r["doc_id"]: r["cluster"] for r in labels.collect()}
    assert got == unrolled
    assert len(set(depths[1:])) == 1, depths
    # survivor-selection property: every cluster id is its own keeper
    keepers = {c for c in got.values()}
    assert all(got[k] == k for k in keepers)


def test_kmeans_fixpoint_first_step_matches_query_and_converges(spark):
    """kmeans_fixpoint(max_iters=1) reproduces the oracle-checked Lloyd step
    exactly; run to tolerance it terminates by convergence with constant
    per-iteration plan depth."""
    from deepcrawl4ai_spark.operators.similarity import (
        ann_kmeans_update,
        kmeans_fixpoint,
    )

    emb = load_table(spark, SF, "embeddings")
    one, iters1 = kmeans_fixpoint(emb, max_iters=1)
    assert iters1 == 1
    got = {
        (r["cid"], d): round(v, 4)
        for r in one.collect()
        for d, v in enumerate(r["cv"])
    }
    want = {
        (r["cid"], r["dim"]): r["centroid_val"]
        for r in ann_kmeans_update(spark, SF).collect()
    }
    assert got == want

    depths: list[int] = []
    cents, iters = kmeans_fixpoint(emb, max_iters=25, tol=1e-9, plan_depths=depths)
    assert 1 < iters < 25, f"expected convergence, ran {iters}"
    assert len(set(depths[1:])) == 1, depths
    assert cents.count() == one.count()  # no cluster lost


def test_bpe_learn_scales_merges_with_constant_plan_depth(spark):
    """_bpe_learn at a higher merge count (VERDICT r5 #6): the first 8
    merges of a 24-merge run equal the oracle-checked bpe_merges output
    (the loop is prefix-stable — each merge depends only on its
    predecessors), and per-iteration plan depth is constant (the
    localCheckpoint truncation holds at production-scale merge counts)."""
    from deepcrawl4ai_spark.operators.textops import _bpe_learn, bpe_merges

    docs = load_table(spark, SF, "documents")
    want = {
        r["merge_rank"]: (r["a"], r["b"], r["merged"], r["pair_cnt"])
        for r in bpe_merges(spark, SF).collect()
    }
    depths: list[int] = []
    out, _vocab = _bpe_learn(docs, n_merges=24, plan_depths=depths)
    rows = out.collect()
    assert len(rows) == 24
    got8 = {
        r["merge_rank"]: (r["a"], r["b"], r["merged"], r["pair_cnt"])
        for r in rows
        if r["merge_rank"] <= 8
    }
    assert got8 == want
    assert len(set(depths)) == 1, depths  # constant from iteration 1


def test_bpe_learn_stops_when_pairs_exhausted(spark):
    """A corpus of single-character words has no adjacent symbol pairs:
    the loop must stop early with an EMPTY merge table and an intact vocab
    (not cross-join an empty best frame into an empty vocab)."""
    from deepcrawl4ai_spark.operators.textops import _bpe_learn

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c a")], "doc_id long, text string"
    )
    out, vocab = _bpe_learn(docs, n_merges=8)
    assert out.count() == 0
    assert vocab.count() == 3  # the three single-char words survive
