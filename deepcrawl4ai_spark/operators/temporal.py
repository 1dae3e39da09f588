"""Temporal operators Spark's SQL surface lacks as primitives — as-of join
and gap-based sessionization — re-expressed as single-shuffle compositions
of window functions, plus a deterministic train/val/test splitter.

These extend the training-data-pipeline family (dedup/ANN/text analysis):
event-stream feature attachment (as-of), behavioural grouping (sessions),
and reproducible dataset splits are the standard preprocessing steps between
a crawl store and a training run.

Scale notes (100 TB):
- as-of join = ONE shuffle on the join key: both sides union into a single
  (key, time)-ordered window pass (no per-row Python, no broadcast of the
  big side, no range-explode). This is the standard scale shape; a
  sort-merge "ASOF" physical operator would save only the union.
- sessionization = the same single window shuffle; session assignment is a
  running sum over the gap flag (whole-stage codegen).
- the splitter is a stateless hash — embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from deepcrawl4ai_spark.sources.tables import load_table

SESSION_GAP_US = 1800 * 1_000_000  # 30 min, in microseconds


def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click gets the most recent view value at or
    before its timestamp, per user. Implemented as union + last(ignorenulls)
    over a (user_id, ts)-ordered window — one shuffle, exact tie-breaks
    (views sort before clicks at equal ts; among equal-ts views the highest
    event_id wins, matching the oracle's dedup)."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value", F.lit(0).alias("is_click")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value", F.lit(1).alias("is_click")
    )
    u = views.unionByName(clicks)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_click", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    last_view = F.last(
        F.when(F.col("is_click") == 0, F.col("value")), ignorenulls=True
    ).over(w)
    return (
        u.withColumn("last_view_value", last_view)
        .filter(F.col("is_click") == 1)
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
            "last_view_value",
        )
    )


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is idle
    longer than SESSION_GAP_US. session_idx = running sum of gap flags over
    one (user_id, ts)-ordered window; per-session aggregates follow in the
    same shuffle's partitioning."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # interval arithmetic, not unix_micros: the table's ts is TIMESTAMP_NTZ,
    # and NTZ minus NTZ → exact day-time interval with no timezone coupling
    prev_ts = F.lag("ts").over(w)
    new_s = F.when(
        prev_ts.isNull()
        | ((F.col("ts") - prev_ts) > F.expr("INTERVAL 30 MINUTE")),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    s = ev.withColumn("session_idx", F.sum(new_s).over(run).cast("int"))
    return s.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def train_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by content-independent
    doc_id hash — reproducible across runs, clusters, and engines (the md5
    contract shared with the DuckDB oracle). Stateless projection: no
    shuffle, no RNG state."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 10
    split = (
        F.when(bucket <= 7, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select("doc_id", "lang", split.alias("split"))


def sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same 30-min-gap sessionization via Spark's NATIVE session_window
    aggregate (usable in batch and Structured Streaming alike) — one
    hash-aggregate with a merging session buffer instead of two window
    passes. Output keys on the session's start; counts and sums must equal
    sessionize_events' composition row-for-row (the oracle is the same
    closed form). Boundary nuance: native splits at diff >= gap, the
    composition at diff > gap — distinguishable only by a diff of exactly
    30:00.000000, which µs-grained event data never hits."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE JOIN — the interval-predicate join Spark SQL has no native
    operator for (the as-of join's two-sided sibling): for every 'error'
    event, count the same user's 'signup' events inside [ts − 1h, ts + 1h].
    The honest distributed shape is equi-join on the bounding key (user_id)
    + range predicate, so each probe touches only its user's events — at
    100 TB the pair space is bounded by per-user event counts, never the
    cross product. TIMESTAMP_NTZ-safe interval arithmetic throughout.

    Output: (event_id, user_id, n_nearby_signups) for every error event."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("e_ts")
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts")
    )
    joined = errors.join(
        signups,
        (F.col("user_id") == F.col("s_user"))
        & (F.col("s_ts") >= F.col("e_ts") - F.expr("INTERVAL 1 HOURS"))
        & (F.col("s_ts") <= F.col("e_ts") + F.expr("INTERVAL 1 HOURS")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("s_ts").alias("n_nearby_signups")
    )
