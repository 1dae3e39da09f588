"""Wire-latency fan-out bench (VERDICT r3 #1 done-bar): with ZERO per-page
CPU work and a 50 ms slow origin, throughput through ONE fetch partition
must scale with the in-partition semaphore width, not with cores — the
proof that the http transport is no longer capped at one in-flight request
per core.

Runs the fetch_map UDF directly (no Spark session — the UDF is a plain
batch function; this isolates the transport from scheduler noise) against a
local slow server and prints one JSON line:
{"delay_ms": 50, "n_urls": 200, "legs": [{"concurrency": 1, "sec": ...,
  "urls_per_sec": ...}, ...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    import pandas as pd

    from deepcrawl4ai_spark.frontier import fetcher as FE
    from deepcrawl4ai_spark.frontier import webgraph as WG
    from deepcrawl4ai_spark.frontier.httpserver import SyntheticWebServer

    delay_ms = float(os.environ.get("FETCH_BENCH_DELAY_MS", "50"))
    n_urls = int(os.environ.get("FETCH_BENCH_URLS", "200"))
    widths = [1, 2, 5, 10, 20]

    urls = [WG.page_url(i % WG.N_HOSTS, i // WG.N_HOSTS) for i in range(n_urls)]
    pdf = pd.DataFrame(
        {
            "url_norm": urls,
            "url_hash": [WG.sha1_hex(u) for u in urls],
            "host": [u.split("://")[1].split("/")[0] for u in urls],
            "depth": [0] * n_urls,
            "score": [0.0] * n_urls,
            "attempt": [0] * n_urls,
        }
    )
    legs = []
    with SyntheticWebServer(delay_s=delay_ms / 1000.0) as srv:
        for w in widths:
            FE.pool_reset()
            fmap = FE.make_fetch_map(
                {"kind": "http", "base": srv.base, "concurrency": w}
            )
            before = srv.n_requests
            t0 = time.time()
            out = pd.concat(list(fmap(iter([pdf]))), ignore_index=True)
            sec = time.time() - t0
            assert len(out) == n_urls
            assert srv.n_requests - before == n_urls  # exactly once each
            legs.append(
                {
                    "concurrency": w,
                    "sec": round(sec, 2),
                    "urls_per_sec": round(n_urls / sec, 1),
                }
            )
    FE.pool_reset()
    print(json.dumps({"delay_ms": delay_ms, "n_urls": n_urls, "legs": legs}))


if __name__ == "__main__":
    main()
