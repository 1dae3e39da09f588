"""Flagship query for the driver smoke check (entry())."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deepcrawl4ai_spark.functions.urlnorm import with_url_columns
from deepcrawl4ai_spark.sources.tables import load_table


def flagship_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-ingest + canonicalization slice (SURVEY.md S1+P1): synthesize a
    seed list from documents, RFC-3986-normalize + hash it, and report
    per-host frontier stats ordered by priority."""
    docs = load_table(spark, sf_dir, "documents")
    seeds = docs.select(
        F.concat(
            F.lit("HTTP://"),
            F.upper(F.col("source")),
            F.lit(".COM:80/docs/../"),
            F.col("lang"),
            F.lit("/"),
            F.col("doc_id"),
            F.lit("#top"),
        ).alias("url"),
        (F.col("n_chars") / 100.0).alias("score"),
    )
    canon = with_url_columns(seeds)
    return (
        canon.groupBy("host", "host_hash")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("url_hash").alias("n_unique"),
            F.round(F.avg("score"), 4).alias("avg_score"),
            F.max("score").alias("top_score"),
        )
        .orderBy(F.col("top_score").desc(), F.col("host").asc())
    )
