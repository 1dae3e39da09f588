"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in deepcrawl4ai_spark/ (see SURVEY.md §2 for the operator
inventory each query name maps to).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one full frontier round at sf0.001 — seed ingest (S1) →
    URL canonicalization (P1) → per-host priority selection (S4/O1/O2) →
    deterministic fetch (F1) → span extraction — reported as spans-per-kind
    per host."""
    from deepcrawl4ai_spark.flagship import flagship_query

    return flagship_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from deepcrawl4ai_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same column names/aliases."""
    from deepcrawl4ai_spark.registry import ORACLES

    return dict(ORACLES)
