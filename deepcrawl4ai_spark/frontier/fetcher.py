"""The fetch stage: mapInPandas over Arrow batches (SURVEY.md F1/F2).

In this sandbox the "network" is the deterministic synthetic web
(webgraph.fetch_page); on a real cluster the inner loop becomes an
executor-local async HTTP client pool keyed by config signature — exactly
the reference's browser-pool pattern (reference crawler_pool.py:25-49)
hoisted into the UDF module (a module-level cache lives once per executor
process, so sessions are reused across batches).

One output row per input row; spans/links as Arrow list columns. The fetch
boundary is inherently per-URL I/O — everything around it (selection, dedup,
scoring) stays in JVM codegen.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from deepcrawl4ai_spark.frontier import webgraph as WG
from deepcrawl4ai_spark.schemas import SPAN

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("fetch_status", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), True),
        T.StructField("links", T.ArrayType(T.StringType()), True),
        T.StructField("fetch_pid", T.IntegerType(), False),
    ]
)

# executor-local "session pool" (reference crawler_pool.py get-or-create
# under config-signature key) — here it just counts reuse, proving the
# pattern; a real fetcher would hold aiohttp sessions per config_sig.
_SESSION_POOL: dict[str, int] = {}


# Deterministic per-page CPU work simulating realistic fetch+parse cost
# (the reference's per-page browser work is seconds; html→markdown alone is
# ms-scale). 0 = off. Calibrated: ~2500 pbkdf2-sha256 iters ≈ 1 ms.
import hashlib as _hashlib
import os as _os

_FETCH_WORK_MS = float(_os.environ.get("CRAWL_FETCH_WORK_MS", "0"))
_ITERS_PER_MS = 2500


def fetch_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    _SESSION_POOL["default"] = _SESSION_POOL.get("default", 0) + 1
    work_iters = int(_FETCH_WORK_MS * _ITERS_PER_MS)
    for pdf in batches:
        spans_col, links_col, status_col = [], [], []
        for u in pdf["url_norm"]:
            if work_iters:
                _hashlib.pbkdf2_hmac("sha256", u.encode(), b"fetchwork", work_iters)
            page = WG.fetch_page(u)
            status_col.append(page.fetch_status)
            spans_col.append(
                [
                    {"kind": k, "text": t, "media_ref": m, "offset": o}
                    for (k, t, m, o) in page.spans
                ]
            )
            links_col.append(list(page.outlinks))
        yield pd.DataFrame(
            {
                "url_hash": pdf["url_hash"],
                "url_norm": pdf["url_norm"],
                "host": pdf["host"],
                "depth": pdf["depth"],
                "score": pdf["score"],
                "attempt": pdf["attempt"],
                "fetch_status": status_col,
                "spans": spans_col,
                "links": links_col,
                "fetch_pid": pid,
            }
        )


def run_fetch(selected: DataFrame) -> DataFrame:
    """selected: (url_hash, url_norm, host, depth, score, attempt, …) →
    fetched rows with spans + outlinks."""
    cols = ["url_hash", "url_norm", "host", "depth", "score", "attempt"]
    return selected.select(*cols).mapInPandas(fetch_map, FETCH_SCHEMA)
