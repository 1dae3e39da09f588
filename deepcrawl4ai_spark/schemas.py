"""Canonical StructType schemas (SURVEY.md §1.4).

The reference keeps schemas dynamic (Pydantic at edges, JSON strings in Redis —
schemas.py:7-21, crawl.py:303 in /root/reference). The rebuild inverts this:
fixed columnar schemas end-to-end, per BASELINE.json input_hint.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The input_hint table, verbatim: interleaved text + media span documents.
# Mirrors the reference CrawlResult payload (markdown text interleaved with
# media["images"|"videos"|"audios"] items — reference triggers.py:221-226).
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # text|image|video|audio
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

SPAN_DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# Frontier — replaces the reference's Redis list + scheduled zset
# (crawl.py:165, crawl.py:76-77). state: queued|fetched|failed|disallowed
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("url_hash", T.StringType(), False),  # sha1 hex of url_norm
        T.StructField("host", T.StringType(), False),
        T.StructField("host_hash", T.LongType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("due_round", T.IntegerType(), False),  # event-time: round number, not wall clock
        T.StructField("state", T.StringType(), False),
        T.StructField("round_added", T.IntegerType(), False),
        T.StructField("attempt", T.IntegerType(), False),
    ]
)

# Partitioned bloom-filter URL-seen set (north_rule). One row per partition.
SEEN_FILTER = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("filter_kind", T.StringType(), False),  # 'bloom'
        T.StructField("bits", T.BinaryType(), False),
        T.StructField("n_items", T.LongType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# Politeness fixtures — replaces RateLimiter/TokenBucket config
# (reference config.yml:71, redisCache.py:85-89).
ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("crawl_delay", T.DoubleType(), False),
        T.StructField("rps_budget", T.DoubleType(), False),
        T.StructField("max_tokens", T.IntegerType(), False),
        T.StructField("disallow_rules", T.ArrayType(T.StringType()), False),
    ]
)

# Round lineage + metrics — replaces Redis task:{id} hashes + operation_metrics
# (reference api.py:400-406, monitor.py:74-89).
ROUNDS = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("urls_popped", T.LongType(), False),
        T.StructField("urls_fetched", T.LongType(), False),
        T.StructField("urls_failed", T.LongType(), False),
        T.StructField("outlinks_seen", T.LongType(), False),
        T.StructField("dedup_dropped", T.LongType(), False),
        T.StructField("new_frontier", T.LongType(), False),
        T.StructField("state", T.StringType(), False),  # committed|canceled
        T.StructField(
            "per_partition",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("pid", T.IntegerType(), False),
                        T.StructField("rows", T.LongType(), False),
                        T.StructField("ms", T.LongType(), False),
                    ]
                )
            ),
            True,
        ),
    ]
)

# Per-fetch result document (reference CrawlResult → model_dump, tasks.py:381-383).
RESULTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("fetch_status", T.StringType(), False),  # success|failed
        T.StructField("spans", T.ArrayType(SPAN), True),
        T.StructField("links", T.ArrayType(T.StringType()), True),
        T.StructField("error", T.StringType(), True),
    ]
)

SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("depth", T.IntegerType(), False),
    ]
)

# TaskStatus state machine (reference utils.py:25-35, 10 states) — kept as the
# engine's job-state vocabulary.
TASK_STATUSES = (
    "pending",
    "in_progress",
    "completed",
    "failed",
    "canceled",
    "revoked",
    "retrying",
    "scheduled",
    "paused",
    "unknown",
)

# CeleryTaskStatus (reference utils.py:37-43) → domain status mapping
# (reference utils.py:225-235).
CELERY_TO_DOMAIN = {
    "PENDING": "pending",
    "STARTED": "in_progress",
    "SUCCESS": "completed",
    "FAILURE": "failed",
    "RETRY": "retrying",
    "REVOKED": "revoked",
}
