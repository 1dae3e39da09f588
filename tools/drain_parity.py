"""Long-horizon golden validation: crawl a universe for many consecutive
rounds and require the engine to equal the pure-Python simulator on EVERY
per-round metric, then on the final state census (queued / fetched /
failed). This is the north_rule's crawl-order + URL-seen-set contract
stretched over drain-mode dynamics (queue shrinking, retries releasing,
hosts exhausting) that 2-3-round tests never reach.

    CRAWL_N_HOSTS=100 CRAWL_PAGE_SCALE=510 python tools/drain_parity.py \
        --rounds 25 --seeds 2000 --budget 2000 --cores 16
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

METRIC_KEYS = (
    "urls_popped",
    "urls_fetched",
    "urls_failed",
    "outlinks_seen",
    "dedup_dropped",
    "new_frontier",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=25)
    ap.add_argument("--seeds", type=int, default=2000)
    ap.add_argument("--budget", type=int, default=2000)
    ap.add_argument("--max-depth", type=int, default=12)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument(
        "--transport",
        choices=("synthetic", "http"),
        default="synthetic",
        help="http = every page of the 25-round drain fetched over a real "
        "wire (local origin); the engine must STILL equal the simulator",
    )
    args = ap.parse_args()

    from deepcrawl4ai_spark.frontier import webgraph as WG
    from deepcrawl4ai_spark.frontier.engine import CrawlEngine, EngineConfig
    from deepcrawl4ai_spark.frontier.simulator import SimConfig, simulate
    from deepcrawl4ai_spark.session import get_spark

    cfg = dict(
        global_budget=args.budget,
        max_depth=args.max_depth,
        max_attempts=2,
    )
    seeds = WG.gen_seeds(args.seeds)
    sim = simulate(seeds, SimConfig(max_rounds=args.rounds, **cfg))

    spark = get_spark("drain_parity", cores=args.cores)
    store = tempfile.mkdtemp(prefix="drainstore_", dir="/dev/shm")
    server = None
    transport = None
    if args.transport == "http":
        from deepcrawl4ai_spark.frontier.httpserver import SyntheticWebServer

        server = SyntheticWebServer().start()
        transport = {"kind": "http", "base": server.base}
    try:
        eng = CrawlEngine(
            spark,
            store,
            EngineConfig(max_rounds=args.rounds, transport=transport, **cfg),
        )
        t0 = time.time()
        metrics = eng.run(seeds)
        wall = time.time() - t0
        assert len(metrics) == len(sim.round_metrics), (
            f"round count {len(metrics)} vs sim {len(sim.round_metrics)}"
        )
        mismatches = 0
        for i, (m, s) in enumerate(zip(metrics, sim.round_metrics)):
            for k in METRIC_KEYS:
                if m.get(k) != s.get(k):
                    print(f"MISMATCH round {i} {k}: engine {m.get(k)} sim {s.get(k)}")
                    mismatches += 1
        # final census from the frontier view
        from pyspark.sql import functions as F

        census = {
            r["state"]: r["n"]
            for r in eng.store.read(spark, "frontier")
            .groupBy("state")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        sim_census: dict[str, int] = {}
        for e in sim.frontier.values():
            sim_census[e.state] = sim_census.get(e.state, 0) + 1
        if census != sim_census:
            print(f"MISMATCH census: engine {census} sim {sim_census}")
            mismatches += 1
        out = {
            "rounds": len(metrics),
            "mismatches": mismatches,
            "census": census,
            "wall_sec": round(wall, 2),
            "avg_round_sec": round(wall / max(len(metrics), 1), 2),
            "cores": args.cores,
            "transport": args.transport,
        }
        if server is not None:
            total_popped = sum(m["urls_popped"] for m in metrics)
            out["wire_requests"] = server.n_requests
            out["wire_exactly_once"] = server.n_requests == total_popped
            if not out["wire_exactly_once"]:
                print(
                    f"MISMATCH wire: {server.n_requests} requests for "
                    f"{total_popped} popped"
                )
                mismatches += 1
                out["mismatches"] = mismatches
        print(json.dumps(out))
        return 1 if mismatches else 0
    finally:
        shutil.rmtree(store, ignore_errors=True)
        spark.stop()
        if server is not None:
            server.stop()


if __name__ == "__main__":
    raise SystemExit(main())
