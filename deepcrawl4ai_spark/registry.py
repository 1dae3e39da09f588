"""Query registry: every implemented operator as a (Spark callable, oracle SQL)
pair for the driver's DuckDB correctness harness (see __spark_entry__.py).

Column names are aliased identically on both sides — the harness sorts columns
by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from deepcrawl4ai_spark.operators import relational as R
from deepcrawl4ai_spark.operators import urlops as U

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _q(name: str, fn: QueryFn, sql: str | None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql


# --- A-family -------------------------------------------------------------

_q(
    "a1_success_fail_counts",
    R.a1_success_fail_counts,
    """
    SELECT CAST(ts AS DATE) AS round_day,
           count(*) FILTER (WHERE event_type <> 'error') AS success_count,
           count(*) FILTER (WHERE event_type = 'error') AS fail_count,
           count(*) AS total
    FROM events GROUP BY 1
    """,
)

_q(
    "a2_error_rate",
    R.a2_error_rate,
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'error') AS errors,
           count(*) AS total,
           round(count(*) FILTER (WHERE event_type = 'error') * 1.0 / count(*), 6)
             AS error_rate
    FROM events GROUP BY user_id
    """,
)

_q(
    "a4_operation_metrics",
    R.a4_operation_metrics,
    """
    SELECT event_type,
           round(sum(value), 4) AS total_value,
           round(max(value), 4) AS peak_value,
           count(*) AS urls_processed,
           count(DISTINCT user_id) AS distinct_ops
    FROM events GROUP BY event_type
    """,
)

_q(
    "a6_queue_length",
    R.a6_queue_length,
    """
    SELECT user_id, count(*) AS queue_len
    FROM events WHERE event_type = 'click' GROUP BY user_id
    """,
)

_q(
    "r1_dynamic_rate_limit",
    R.r1_dynamic_rate_limit,
    """
    WITH per_user AS (
      SELECT user_id,
             avg(value) / 1000.0 AS cpu,
             max(value) / 2000.0 AS mem,
             (count(*) FILTER (WHERE event_type = 'error')) * 1.0 / count(*) AS err
      FROM events GROUP BY user_id
    )
    SELECT user_id, round(cpu, 6) AS cpu, round(mem, 6) AS mem,
           round(err, 6) AS err,
           greatest(10.0, CAST(floor(100.0 * least(1.0 - cpu, 1.0 - mem, 1.0 - err)) AS DOUBLE))
             AS rate_limit
    FROM per_user
    """,
)

# --- O / T / R-family ------------------------------------------------------

_q(
    "o1_priority_topk",
    R.o1_priority_topk,
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
)

_q(
    "o2_round_budget",
    R.o2_round_budget,
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
)

_q(
    "t8_due_release",
    R.t8_due_release,
    """
    SELECT event_type, count(*) AS due_count, max(ts) AS last_due
    FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
    GROUP BY event_type
    """,
)

_q(
    "r8_retry_backoff",
    R.r8_retry_backoff,
    """
    SELECT event_id,
           CAST(event_id % 5 AS INTEGER) AS attempt,
           round(least(5.0, 0.5 * pow(2.0, CAST(event_id % 5 AS INTEGER))
                 + ((event_id * 2654435761) % 4294967296) % 1000 / 2000.0), 6)
             AS backoff_s
    FROM events
    """,
)

# --- J-family ---------------------------------------------------------------

_q(
    "j1_stream_dedup",
    R.j1_stream_dedup,
    """
    SELECT user_id, event_type, min(event_id) AS first_event_id,
           count(*) AS dups
    FROM events GROUP BY user_id, event_type
    """,
)

_q(
    "j3_exact_antijoin",
    R.j3_exact_antijoin,
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)

_q(
    "j4_broadcast_lookup",
    R.j4_broadcast_lookup,
    """
    SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)

_q(
    "j5_dim_join",
    R.j5_dim_join,
    """
    SELECT r_name, count(*) AS n_customers, round(avg(c_acctbal), 4) AS avg_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)

# --- P-family ---------------------------------------------------------------

_q(
    "p1_url_normalize",
    U.p1_url_normalize,
    """
    SELECT doc_id,
           'http://www.' || lower(source) || '.com/a/' || lang || '/page'
             || CAST(doc_id % 7 AS VARCHAR)
             || '?alpha=1&beta=' || CAST(n_chars AS VARCHAR) AS url_norm,
           sha256('http://www.' || lower(source) || '.com/a/' || lang || '/page'
             || CAST(doc_id % 7 AS VARCHAR)
             || '?alpha=1&beta=' || CAST(n_chars AS VARCHAR)) AS url_digest
    FROM documents
    """,
)

_q(
    "p1_url_host",
    U.p1_url_host,
    """
    SELECT 'www.' || lower(source) || '.com' AS host, count(*) AS n_urls
    FROM documents GROUP BY 1
    """,
)

_q(
    "p3_url_slug",
    U.p3_url_slug,
    """
    SELECT doc_id,
           regexp_replace(source || '.com/p q/' || lang || '/' || CAST(doc_id AS VARCHAR),
                          '[^a-zA-Z0-9_-]', '-', 'g') AS slug
    FROM documents
    """,
)

_q(
    "p2_url_validation",
    R.p2_url_validation,
    """
    WITH u AS (
      SELECT doc_id,
             CASE
               WHEN doc_id % 3 = 0 THEN 'https://' || source || '.com/p/' || CAST(doc_id AS VARCHAR)
               WHEN doc_id % 3 = 1 THEN 'ftp://' || source || '.com/p/' || CAST(doc_id AS VARCHAR)
               ELSE 'not a url ' || CAST(doc_id AS VARCHAR)
             END AS url
      FROM documents
    )
    SELECT doc_id, url FROM u WHERE regexp_matches(url, '^https?://')
    """,
)

_q(
    "p5_external_link_filter",
    R.p5_external_link_filter,
    """
    WITH links AS (
      SELECT 'h' || CAST(o_custkey % 10 AS VARCHAR) AS src_host,
             'h' || CAST(o_orderkey % 13 AS VARCHAR) AS dst_host
      FROM orders
    )
    SELECT src_host, count(*) AS internal_links
    FROM links WHERE src_host = dst_host GROUP BY src_host
    """,
)

_q(
    "p7_status_color",
    R.p7_status_color,
    """
    SELECT CASE event_type
             WHEN 'error' THEN 'red'
             WHEN 'purchase' THEN 'green'
             WHEN 'signup' THEN 'blue'
             WHEN 'click' THEN 'yellow'
             ELSE 'gray' END AS color,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)

_q(
    "p8_status_convert",
    R.p8_status_convert,
    """
    SELECT CASE event_id % 6
             WHEN 0 THEN 'pending'
             WHEN 1 THEN 'in_progress'
             WHEN 2 THEN 'completed'
             WHEN 3 THEN 'failed'
             WHEN 4 THEN 'retrying'
             ELSE 'revoked' END AS status,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
