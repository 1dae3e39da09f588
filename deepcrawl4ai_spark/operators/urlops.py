"""URL canonicalization operators as driver-checkable queries (SURVEY.md P1/P3).

URLs are synthesized deterministically from documents columns so the DuckDB
oracle can construct the *expected* normalized form directly in SQL — this
checks the pandas-UDF normalizer against a closed-form answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deepcrawl4ai_spark.functions.urlnorm import normalize_urls_udf, url_slug_udf, url_host_udf
from deepcrawl4ai_spark.sources.tables import load_table


def _messy_url(doc):
    """Messy URL: uppercase scheme/host, default port, dot-segments, unsorted
    query, fragment — everything RFC 3986 normalization must fix
    (reference only did scheme-prepend + unquote: tasks.py:343, api.py:210)."""
    return F.concat(
        F.lit("HTTP://WWW."),
        F.upper(F.col("source")),
        F.lit(".COM:80/a/b/../"),
        F.col("lang"),
        F.lit("/./page"),
        (F.col("doc_id") % 7),
        F.lit("?beta="),
        F.col("n_chars"),
        F.lit("&alpha=1#frag"),
    )


def p1_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: RFC 3986 normalize + hash. Oracle rebuilds the expected string."""
    docs = load_table(spark, sf_dir, "documents")
    out = docs.select("doc_id", _messy_url(docs).alias("url"))
    out = out.withColumn("url_norm", normalize_urls_udf(F.col("url")))
    # sha2-256 for oracle parity (DuckDB core lacks sha1; engine itself uses sha1)
    return out.select(
        "doc_id", "url_norm", F.sha2(F.col("url_norm"), 256).alias("url_digest")
    )


def p1_url_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1b: host extraction from the normalized URL (frontier partition key)."""
    docs = load_table(spark, sf_dir, "documents")
    out = docs.select("doc_id", _messy_url(docs).alias("url"))
    out = out.withColumn("url_norm", normalize_urls_udf(F.col("url")))
    out = out.withColumn("host", url_host_udf(F.col("url_norm")))
    return out.groupBy("host").agg(F.count("*").alias("n_urls"))


def p3_url_slug(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: url_to_unique_name — netloc+path, non-alnum → '-'
    (reference utils.py:176-180)."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".com/p q/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id"),
    )
    out = docs.select("doc_id", url.alias("url"))
    return out.select("doc_id", url_slug_udf(F.col("url")).alias("slug"))
