"""The fetch stage: mapInPandas over Arrow batches (SURVEY.md F1/F2), behind
a pluggable TRANSPORT seam.

Transports:
- ``synthetic`` (default): the deterministic closed-form web
  (webgraph.fetch_page) — replayable, the golden-test oracle.
- ``http``: a real wire — executor-local pooled http.client connections
  (keep-alive, reconnect-on-idle-close) GET each URL from a server speaking
  the lossless HTML page format (htmlpage), and parse the HTML back into
  spans/links. This is the reference's pooled-browser fetch shape (reference
  actions.py:218-293, crawler_pool.py:25-49) with the stdlib client standing
  in for aiohttp/playwright. NOT replayable: the engine disables its
  optimistic double-fetch path for it (EngineConfig.replayable_fetch).

The transport dict travels by closure into the UDF (cloudpickle), so tests
can point at an ephemeral-port server created AFTER the SparkSession; env
(CRAWL_TRANSPORT / CRAWL_HTTP_BASE) only sets the default for spark-submit.

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
    client: object | None = None  # http transport: pooled HTTPConnection

    def close(self) -> None:
        self.closed = True
        if self.client is not None:
            try:
                self.client.close()
            except Exception:  # noqa: BLE001 — already-dead socket
                pass
            self.client = None


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


# --- transport seam -----------------------------------------------------------


def default_transport() -> dict:
    """Env-driven default (spark-submit path): CRAWL_TRANSPORT=synthetic|http,
    CRAWL_HTTP_BASE=http://host:port. Tests pass a transport dict explicitly
    instead (ephemeral ports exist only after session start)."""
    kind = _os.environ.get("CRAWL_TRANSPORT", "synthetic")
    t: dict = {"kind": kind}
    if kind == "http":
        t["base"] = _os.environ.get("CRAWL_HTTP_BASE", "http://127.0.0.1:8765")
        # an HTTP fetch is a side effect; only a caller who KNOWS the server
        # is a replay-safe cache may mark it replayable
        t["replayable"] = _os.environ.get("CRAWL_HTTP_REPLAYABLE") == "1"
    return t


def transport_replayable(transport: dict | None = None) -> bool:
    """May the engine speculatively fetch-then-discard (optimistic selection)?
    True only for side-effect-free transports (ADVICE r2: a double fetch over
    a real wire is a politeness violation)."""
    t = transport or default_transport()
    return t["kind"] == "synthetic" or bool(t.get("replayable"))


def _http_get_page(transport: dict, url_norm: str, url_hash: str):
    """GET one page over the pooled keep-alive connection; parse the HTML
    wire format back into a Page. Non-200 → failed page (the reference maps
    fetch errors to a failed task result, tasks.py:173-210). One silent
    reconnect handles a server-closed idle connection."""
    import http.client
    import urllib.parse

    from deepcrawl4ai_spark.frontier.htmlpage import parse_html
    from deepcrawl4ai_spark.frontier.webgraph import Page

    base = transport["base"]
    sess = get_session(f"http:{base}")
    parts = urllib.parse.urlsplit(base)
    path = "/page?u=" + urllib.parse.quote(url_norm, safe="")
    for attempt in range(2):
        conn = sess.client
        if conn is None:
            conn = http.client.HTTPConnection(
                parts.hostname, parts.port or 80, timeout=30
            )
            sess.client = conn
        try:
            conn.request("GET", path)
            resp = conn.getresponse()
            body = resp.read()
            status = resp.status
            break
        except (ConnectionError, http.client.HTTPException, OSError):
            try:
                conn.close()
            except Exception:  # noqa: BLE001
                pass
            sess.client = None
            if attempt == 1:
                raise
    if status != 200:
        return Page(url_norm, url_hash, "failed", (), ())
    return parse_html(url_norm, url_hash, body.decode())


def _fetch_one(transport: dict, url_norm: str, url_hash: str):
    if transport["kind"] == "synthetic":
        return WG.fetch_page(url_norm)
    return _http_get_page(transport, url_norm, url_hash)


def make_fetch_map(transport: dict | None = None):
    """Build the mapInPandas fetch function for *transport* (closure-captured
    so executors see the exact dict, including test-time ephemeral ports)."""
    transport = transport or default_transport()

    def fetch_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        get_session("default")  # session reuse across batches within the worker
        work_iters = int(_FETCH_WORK_MS * _ITERS_PER_MS)
        for pdf in batches:
            spans_col, links_col, status_col = [], [], []
            for u, uh in zip(pdf["url_norm"], pdf["url_hash"]):
                if work_iters:
                    _hashlib.pbkdf2_hmac(
                        "sha256", u.encode(), b"fetchwork", work_iters
                    )
                page = _fetch_one(transport, u, uh)
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

    return fetch_map


# module-level default (synthetic) kept for direct importers
fetch_map = make_fetch_map({"kind": "synthetic"})


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


def run_fetch(selected: DataFrame, transport: dict | None = None) -> DataFrame:
    """selected: (url_hash, url_norm, host, depth, score, attempt, …) →
    fetched rows with spans + outlinks, via *transport* (default: env)."""
    cols = ["url_hash", "url_norm", "host", "depth", "score", "attempt"]
    return selected.select(*cols).mapInPandas(make_fetch_map(transport), FETCH_SCHEMA)


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


# --- robots-cache fill over the transport (north_rule "robots.txt cache") -----


def fetch_robots_rows(spark, hosts: list[str], transport: dict) -> list[dict]:
    """Distributed robots-cache fill: GET /robots.txt for every host over the
    pooled http transport (executor-side, mapInPandas — at 10^6 hosts this is
    a partitioned fetch job, never a driver loop), parse the bodies with the
    REP parser (functions/robots), and return the engine's politeness dim
    rows. The result is a DIM table (one row per host) — collecting it is
    what broadcasting it means.

    Caveat: robots.txt carries crawl-delay and path rules; token-bucket
    REFILL is crawler config, not REP — rows default refill = capacity, so
    use with token_bucket=False for exact parity with a config-driven table.
    """
    import urllib.parse

    import http.client as _hc

    from deepcrawl4ai_spark.functions.robots import (
        parse_robots_txt,
        to_engine_rows,
    )

    base = transport["base"]
    parts = urllib.parse.urlsplit(base)

    def _get(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sess = get_session(f"http:{base}")
        for pdf in batches:
            bodies = []
            for h in pdf["host"]:
                path = "/robots.txt?h=" + urllib.parse.quote(h, safe="")
                body = ""
                for attempt in range(2):
                    conn = sess.client
                    if conn is None:
                        conn = _hc.HTTPConnection(
                            parts.hostname, parts.port or 80, timeout=30
                        )
                        sess.client = conn
                    try:
                        conn.request("GET", path)
                        resp = conn.getresponse()
                        data = resp.read()
                        if resp.status == 200:
                            body = data.decode()
                        break  # 404 = no robots → empty rules (allow all)
                    except (ConnectionError, _hc.HTTPException, OSError):
                        try:
                            conn.close()
                        except Exception:  # noqa: BLE001
                            pass
                        sess.client = None
                        if attempt == 1:
                            raise
                bodies.append(body)
            yield pd.DataFrame({"host": pdf["host"], "robots_txt": bodies})

    hdf = spark.createDataFrame([(h,) for h in hosts], "host string")
    docs = hdf.repartition(min(max(len(hosts), 1), 32)).mapInPandas(
        _get, "host string, robots_txt string"
    )
    parsed = [
        dict(
            parse_robots_txt(r["robots_txt"]),
            host=r["host"],
        )
        for r in docs.collect()
    ]
    return to_engine_rows(parsed)
