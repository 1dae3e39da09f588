"""Link-graph operators: PageRank over the host graph — the canonical
iterative Spark workload, and the link-analysis signal a crawl scheduler
uses for URL prioritization (the reference scores URLs statically from
sha1; a production frontier upgrades that to link-based authority).

Scale notes (100 TB): each iteration is exactly one shuffle (join ranks to
edges on src, partial-agg contributions by dst) — the textbook Pregel
shape. Edges pre-join their out-degree once; ranks stay (host, rank)
pairs. Iterations here are a fixed unrolled count so the DuckDB oracle can
reproduce the arithmetic exactly; a production run loops to convergence
with the same per-iteration plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deepcrawl4ai_spark.sources.tables import load_table

DAMPING = 0.85
ITERATIONS = 3


def host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 unrolled iterations) over the synthetic
    host link graph (same edge derivation as p5_external_link_filter).
    Dangling-node mass is dropped (the common simplification); nodes with
    no in-links hold the (1-d)/N floor."""
    orders = load_table(spark, sf_dir, "orders")
    edges = orders.select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 10)).alias("src"),
        F.concat(F.lit("h"), (F.col("o_orderkey") % 13)).alias("dst"),
    ).distinct()
    # localCheckpoint, NOT persist (r8: the old persists were never
    # unpersisted — one leaked cached frame pair per invocation for the
    # session's lifetime, competing with execution memory across the whole
    # bench; checkpoint blocks are reclaimed by the ContextCleaner once the
    # caller drops the result). Also truncates the distinct/join lineage the
    # 3 unrolled iterations re-reference.
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    e = edges.join(deg, "src").localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(ITERATIONS):
        ranks = _pagerank_step(nodes, e, ranks, n)
    return ranks.select("host", F.round("rank", 6).alias("rank"))


def _pagerank_step(nodes: DataFrame, e: DataFrame, ranks: DataFrame, n: int) -> DataFrame:
    """One PageRank iteration: join ranks to out-degree edges on src,
    partial-agg contributions by dst — exactly one shuffle."""
    contrib = (
        e.join(ranks.withColumnRenamed("host", "src"), "src")
        .groupBy("dst")
        .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
    )
    return nodes.join(contrib, nodes["host"] == contrib["dst"], "left").select(
        "host",
        (
            F.lit((1.0 - DAMPING) / n)
            + F.lit(DAMPING) * F.coalesce(F.col("c"), F.lit(0.0))
        ).alias("rank"),
    )


def _hits_half_step(
    nodes: DataFrame, edges: DataFrame, scores: DataFrame,
    from_col: str, to_col: str, out_name: str,
) -> DataFrame:
    """One HITS half-iteration: propagate *scores* across edges from
    *from_col* to *to_col*, then L1-normalize — one shuffle (the edge join
    + partial agg) plus a 1-row total broadcast back over the node set."""
    raw = (
        edges.join(scores.withColumnRenamed("host", from_col), from_col)
        .groupBy(to_col)
        .agg(F.sum("s").alias("v"))
    )
    total = raw.agg(F.sum("v").alias("t"))
    return (
        nodes.join(raw, nodes["host"] == raw[to_col], "left")
        .crossJoin(F.broadcast(total))
        .select(
            "host",
            (F.coalesce(F.col("v"), F.lit(0.0)) / F.col("t")).alias(out_name),
        )
    )


def host_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999, public; 3 unrolled
    iterations, L1 normalization — the rational-arithmetic variant of the
    classic L2, chosen so the unrolled DuckDB oracle reproduces the exact
    doubles) over the same synthetic host link graph as host_pagerank.
    Complements PageRank in the frontier's link-analysis panel: authority
    ranks pages worth fetching, hub ranks pages worth re-crawling for
    outlink discovery (the reference scores URLs statically from sha1;
    SURVEY §2 O1's upgrade path).

    Scale shape: per iteration exactly two shuffles (edge join + partial
    agg by dst for authorities, by src for hubs) and two 1-row total
    aggregates broadcast back — the Pregel shape; no windows, no
    all-pairs."""
    orders = load_table(spark, sf_dir, "orders")
    edges = orders.select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 10)).alias("src"),
        F.concat(F.lit("h"), (F.col("o_orderkey") % 13)).alias("dst"),
    ).distinct()
    # Each half-step reads its input TWICE (contribution join + the L1
    # total) — unmaterialized, six unrolled half-steps recompute the base
    # 2^6 times. Truncate with ONE eager localCheckpoint per iteration (the
    # value-identical hits_fixpoint pattern); the un-checkpointed auth half
    # is recomputed at most twice from the checkpointed hub, bounding total
    # work at ~2× per iteration while keeping the job count at
    # ITERATIONS + 1 (each eager checkpoint is a scheduler round-trip that
    # dominates on this tiny graph).
    from deepcrawl4ai_spark.frontier.engine import _unpersist_local_checkpoint

    e = edges.localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    hub = nodes.withColumn("s", F.lit(1.0 / n))
    stale: list[DataFrame] = []
    for _ in range(ITERATIONS):
        auth = _hits_half_step(nodes, e, hub, "src", "dst", "a").withColumnRenamed("a", "s")
        hub = (
            _hits_half_step(nodes, e, auth, "dst", "src", "h")
            .withColumnRenamed("h", "s")
            .localCheckpoint()
        )
        stale.append(hub)
    out = (
        auth.withColumnRenamed("s", "auth")
        .join(hub.withColumnRenamed("s", "hub"), "host")
        .select("host", F.round("auth", 6).alias("auth"), F.round("hub", 6).alias("hub"))
        # the manifest is tiny (one row per host): materialize it so the
        # superseded checkpoints can be released before returning
        .localCheckpoint()
    )
    for df in stale + [nodes, e]:
        _unpersist_local_checkpoint(df)
    return out


def hits_fixpoint(
    edges: DataFrame,
    max_iters: int = 50,
    tol: float = 1e-9,
    plan_depths: list | None = None,
) -> tuple[DataFrame, DataFrame, int]:
    """Production HITS: the SAME per-iteration plan as host_hits but looped
    to convergence (sum |Δauth| < tol, cluster-side aggregate), with
    localCheckpoint() per iteration truncating lineage so plan depth stays
    constant (the pagerank_fixpoint pattern). Returns (auth, hub, iters)."""
    from deepcrawl4ai_spark.frontier.engine import _unpersist_local_checkpoint

    edges = edges.distinct()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    e = edges.localCheckpoint()
    hub = nodes.withColumn("s", F.lit(1.0 / n)).localCheckpoint()
    auth = None
    iters = 0
    for _ in range(max_iters):
        nxt_auth = _hits_half_step(nodes, e, hub, "src", "dst", "a").withColumnRenamed("a", "s")
        if plan_depths is not None:
            plan_depths.append(
                len(nxt_auth._jdf.queryExecution().optimizedPlan().toString().splitlines())
            )
        nxt_auth = nxt_auth.localCheckpoint()
        nxt_hub = _hits_half_step(nodes, e, nxt_auth, "dst", "src", "h") \
            .withColumnRenamed("h", "s").localCheckpoint()
        iters += 1
        if auth is not None:
            delta = (
                nxt_auth.join(auth.withColumnRenamed("s", "old"), "host")
                .agg(F.sum(F.abs(F.col("s") - F.col("old"))).alias("d"))
                .head()["d"]
            )
        else:
            delta = None
        for df in (auth, hub):
            if df is not None:
                _unpersist_local_checkpoint(df)
        auth, hub = nxt_auth, nxt_hub
        if delta is not None and delta < tol:
            break
    for df in (nodes, e):
        _unpersist_local_checkpoint(df)
    return auth, hub, iters


def pagerank_fixpoint(
    edges: DataFrame,
    max_iters: int = 50,
    tol: float = 1e-9,
    plan_depths: list | None = None,
) -> tuple[DataFrame, int]:
    """Production PageRank: the SAME per-iteration plan as host_pagerank but
    looped to convergence (sum |Δrank| < tol — a cluster-side aggregate, not
    a driver row loop), with localCheckpoint() per iteration truncating
    lineage so plan depth stays CONSTANT across iterations (VERDICT r2
    'unrolled iterative lineage': without truncation the logical plan grows
    per iteration without bound). Old checkpoints are unpersisted eagerly.

    *edges*: (src, dst) DataFrame. Returns (ranks, iterations_run).
    *plan_depths* (test hook): appended with the pre-checkpoint plan line
    count each iteration — constancy is the truncation proof."""
    from deepcrawl4ai_spark.frontier.engine import _unpersist_local_checkpoint

    edges = edges.distinct()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    e = edges.join(deg, "src").localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    iters = 0
    for _ in range(max_iters):
        nxt = _pagerank_step(nodes, e, ranks, n)
        if plan_depths is not None:
            plan_depths.append(
                len(nxt._jdf.queryExecution().optimizedPlan().toString().splitlines())
            )
        nxt = nxt.localCheckpoint()
        iters += 1
        delta = (
            nxt.join(ranks.withColumnRenamed("rank", "old"), "host")
            .agg(F.sum(F.abs(F.col("rank") - F.col("old"))).alias("d"))
            .head()["d"]
        )
        _unpersist_local_checkpoint(ranks)
        ranks = nxt
        if delta is not None and delta < tol:
            break
    for df in (nodes, e):
        _unpersist_local_checkpoint(df)
    return ranks, iters
