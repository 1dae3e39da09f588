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

# Deterministic per-page CPU work simulating realistic fetch+parse cost
# (the reference's per-page browser work is seconds; html→markdown alone is
# ms-scale). 0 = off. Calibrated: ~2500 pbkdf2-sha256 iters ≈ 1 ms.
import hashlib as _hashlib
import itertools as _itertools
import os as _os
from dataclasses import dataclass

_FETCH_WORK_MS = float(_os.environ.get("CRAWL_FETCH_WORK_MS", "0"))
_ITERS_PER_MS = 2500


# --- executor-local session pool (F7) ----------------------------------------
# Reference crawler_pool.py:25-49: get-or-create a browser/client under a
# config-signature key; :52-74: a janitor evicts sessions idle past a TTL.
# Here the "session" is a synthetic handle (the sandbox web is closed-form);
# on a real cluster it holds an aiohttp/playwright client. The pool lives at
# module level — once per executor PYTHON PROCESS, reused across batches and
# jobs. Idle time is measured in pool accesses (a deterministic logical
# clock), not wall time, so tests and replays are exact.

SESSION_IDLE_TTL = int(_os.environ.get("CRAWL_SESSION_TTL_ACCESSES", "512"))


@dataclass
class FetchSession:
    config_sig: str
    created_at: int
    last_used: int = 0
    n_uses: int = 0
    closed: bool = False

    def close(self) -> None:  # real impl: await client.close()
        self.closed = True


_SESSION_POOL: dict[str, FetchSession] = {}
_POOL_CLOCK = _itertools.count(1)


def get_session(config_sig: str = "default") -> FetchSession:
    """Get-or-create the executor-local session for *config_sig*; evict (and
    close) any session idle for more than SESSION_IDLE_TTL accesses."""
    now = next(_POOL_CLOCK)
    sess = _SESSION_POOL.get(config_sig)
    if sess is None or sess.closed:
        sess = FetchSession(config_sig=config_sig, created_at=now)
        _SESSION_POOL[config_sig] = sess
    sess.n_uses += 1
    sess.last_used = now
    for key, s in list(_SESSION_POOL.items()):
        if key != config_sig and now - s.last_used > SESSION_IDLE_TTL:
            s.close()
            del _SESSION_POOL[key]
    return sess


def pool_reset() -> None:
    """Test hook: drop all pooled sessions."""
    _SESSION_POOL.clear()


def fetch_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    get_session("default")  # session reuse across batches within the worker
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


def warm_pool(spark, config_sig: str = "default") -> int:
    """F8 warm-up (reference server.py:113-138 pre-creates the browser pool
    at startup): touch every executor python worker with a one-row-per-core
    job that creates the session for *config_sig* ahead of the first real
    fetch. Returns the number of worker processes warmed."""
    import pandas as pd  # noqa: PLC0415 — worker-side import mirror

    n = spark.sparkContext.defaultParallelism

    def _warm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os as _o

        get_session(config_sig)
        for pdf in batches:
            yield pd.DataFrame({"worker_pid": [_o.getpid()] * len(pdf)})

    df = spark.range(n).repartition(n).mapInPandas(_warm, "worker_pid long")
    return df.distinct().count()


def run_fetch(selected: DataFrame) -> DataFrame:
    """selected: (url_hash, url_norm, host, depth, score, attempt, …) →
    fetched rows with spans + outlinks."""
    cols = ["url_hash", "url_norm", "host", "depth", "score", "attempt"]
    return selected.select(*cols).mapInPandas(fetch_map, FETCH_SCHEMA)


# --- F4/F5: page interaction as multi-fetch (SURVEY §2.7) ---------------------

VARIANT_SCHEMA = T.StructType(
    list(FETCH_SCHEMA.fields) + [T.StructField("page_variant", T.IntegerType(), False)]
)


def fetch_variants_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One output row per (url, page_variant): variant 0 is the base load,
    higher variants are post-interaction states (scroll / load-more,
    reference actions.py:8-215). The fan-out count is the page's own
    n_page_variants — the 'no new content' stop condition."""
    from pyspark import TaskContext

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    get_session("default")
    for pdf in batches:
        rows: dict[str, list] = {f.name: [] for f in VARIANT_SCHEMA.fields}
        for u, uh, host, depth, score, attempt in zip(
            pdf["url_norm"], pdf["url_hash"], pdf["host"], pdf["depth"],
            pdf["score"], pdf["attempt"],
        ):
            n_var = 0 if WG.fetch_page(u).fetch_status == "failed" else WG.n_page_variants(u)
            for v in range(n_var + 1):
                page = WG.fetch_page_variant(u, v)
                rows["url_hash"].append(uh)
                rows["url_norm"].append(u)
                rows["host"].append(host)
                rows["depth"].append(depth)
                rows["score"].append(score)
                rows["attempt"].append(attempt)
                rows["fetch_status"].append(page.fetch_status)
                rows["spans"].append(
                    [
                        {"kind": k, "text": t, "media_ref": m, "offset": o}
                        for (k, t, m, o) in page.spans
                    ]
                )
                rows["links"].append(list(page.outlinks))
                rows["fetch_pid"].append(pid)
                rows["page_variant"].append(v)
        yield pd.DataFrame(rows)


def run_fetch_variants(selected: DataFrame) -> DataFrame:
    """F4/F5 multi-fetch: every selected URL fans out into its interaction
    variants, each a full span document with a page_variant column — the
    DataFrame model SURVEY §2.7 proposed for browser-bound scroll/load-more."""
    cols = ["url_hash", "url_norm", "host", "depth", "score", "attempt"]
    return selected.select(*cols).mapInPandas(fetch_variants_map, VARIANT_SCHEMA)
