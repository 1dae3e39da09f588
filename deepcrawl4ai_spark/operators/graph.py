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
    nodes = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    e = edges.join(deg, "src").persist()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(ITERATIONS):
        contrib = (
            e.join(ranks.withColumnRenamed("host", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
        )
        ranks = nodes.join(
            contrib, nodes["host"] == contrib["dst"], "left"
        ).select(
            "host",
            (
                F.lit((1.0 - DAMPING) / n)
                + F.lit(DAMPING) * F.coalesce(F.col("c"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select("host", F.round("rank", 6).alias("rank"))
