"""Span-document operators (SURVEY.md C1/C2/C6) over a nested
array<struct<kind,text,media_ref,offset>> column — the input_hint shape.

The driver testdata's documents table is flat text, so both the Spark side
and the DuckDB oracle BUILD the same spans structure deterministically from
it (4-word groups; kind from md5(doc_id:g)), then apply the operator with
higher-order functions (F.transform / F.filter / explode — all JVM-side).
This checks the span pipeline end-to-end against a closed-form oracle; the
crawl engine's own spans are covered by the simulator golden tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from deepcrawl4ai_spark.sources.tables import load_table


def _with_spans(docs: DataFrame) -> DataFrame:
    """spans: group words in 4s; group g is an image span iff the first hex
    char of md5('<doc_id>:<g>') is 0-3 (25%), else a text span."""
    words = F.split(F.col("text"), " ")
    n_groups = F.floor(F.size(words) / 4).cast("int")
    mkind = lambda g: F.substring(  # noqa: E731
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), g.cast("string"))),
        1,
        1,
    )
    span = lambda g: F.struct(  # noqa: E731
        F.when(mkind(g).isin("0", "1", "2", "3"), F.lit("image"))
        .otherwise(F.lit("text"))
        .alias("kind"),
        F.when(
            mkind(g).isin("0", "1", "2", "3"), F.lit("")
        )
        .otherwise(F.concat_ws(" ", F.slice(words, g * 4 + 1, 4)))
        .alias("text"),
        F.when(
            mkind(g).isin("0", "1", "2", "3"),
            F.concat(
                F.lit("media://"), F.col("doc_id").cast("string"), F.lit("/"), g.cast("string")
            ),
        )
        .otherwise(F.lit(""))
        .alias("media_ref"),
        g.cast("int").alias("offset"),
    )
    spans = F.when(
        n_groups > 0,
        F.transform(F.sequence(F.lit(0), n_groups - 1), span),
    ).otherwise(F.array().cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>"))
    return docs.select("doc_id", spans.alias("spans"))


def c6_media_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: media extraction — image spans with their interleaved position
    (reference triggers.py:221-226, actions.py:62-88)."""
    docs = _with_spans(load_table(spark, sf_dir, "documents"))
    media = docs.select(
        "doc_id",
        F.explode(F.filter(F.col("spans"), lambda s: s["kind"] == "image")).alias("s"),
    )
    return media.select(
        "doc_id", F.col("s.offset").alias("offset"), F.col("s.media_ref").alias("media_ref")
    )


def c2_span_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: pruning content filter at span level — keep text spans with
    ≥20 chars (reference min_word_threshold analog, crawl.py:338-345),
    expressed with F.filter (no explode until the very end)."""
    docs = _with_spans(load_table(spark, sf_dir, "documents"))
    kept = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.col("spans"),
                lambda s: (s["kind"] == "text") & (F.length(s["text"]) >= 20),
            )
        ).alias("s"),
    )
    return kept.select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.text").alias("span_text"),
    )


def c1_interleave_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1/C6: interleaving summary per doc — span counts by kind and the
    position of the first media span (array aggregate, no explode)."""
    docs = _with_spans(load_table(spark, sf_dir, "documents"))
    is_img = lambda s: s["kind"] == "image"  # noqa: E731
    first_img = F.get(F.filter(F.col("spans"), is_img), 0)["offset"]
    return docs.select(
        "doc_id",
        F.size("spans").cast("long").alias("n_spans"),
        F.size(F.filter(F.col("spans"), lambda s: s["kind"] == "text"))
        .cast("long")
        .alias("n_text"),
        F.size(F.filter(F.col("spans"), is_img)).cast("long").alias("n_media"),
        F.coalesce(first_img, F.lit(-1)).alias("first_media_offset"),
    )


def c7_selector_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 (reference dynamic_selectors.py:4-48 infers CSS selectors from
    sample pages): pages sharing a template = docs with the same span count;
    the inferred 'selector' is the dominant span-kind path ('t>i>t…', a
    CSS-path analog) with support and coverage per template. Pure
    aggregation over the spans column — one groupBy at any scale."""
    docs = _with_spans(load_table(spark, sf_dir, "documents")).filter(
        F.size("spans") > 0
    )
    sig = F.array_join(
        F.transform(
            F.col("spans"),
            lambda s: F.when(s["kind"] == "image", F.lit("i")).otherwise(F.lit("t")),
        ),
        ">",
    )
    per_doc = docs.select(F.size("spans").alias("template"), sig.alias("selector"))
    counts = per_doc.groupBy("template", "selector").agg(F.count("*").alias("support"))
    totals = per_doc.groupBy("template").agg(F.count("*").alias("total_docs"))
    w = W.partitionBy("template").orderBy(
        F.col("support").desc(), F.col("selector").asc()
    )
    winners = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    return winners.join(totals, "template").select(
        F.col("template").cast("long").alias("template"),
        "selector",
        "support",
        "total_docs",
        F.round(F.col("support") / F.col("total_docs"), 6).alias("coverage"),
    )


# --- TPC-H classics (Catalyst benchmark anchors) -----------------------------

def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (map-side partial agg + tiny shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: 3-way join, broadcast dims, top-10."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def tpch_q5ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style snowflake: region→nation→customer→orders→lineitem."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast revenue: pure scan-filter-aggregate — the pushdown
    showcase (every predicate reaches the parquet scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )
