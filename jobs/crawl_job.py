"""spark-submit entry point for the frontier crawl.

    zip -r engine.zip deepcrawl4ai_spark      # or tools/make_pyfiles.sh
    spark-submit --master local[32] --py-files engine.zip \
        jobs/crawl_job.py --store /dev/shm/crawlstore --seeds 64 --rounds 5

On a real cluster the same invocation runs with --master yarn/k8s and the
store root on shared storage; everything else is unchanged (the engine only
needs a SparkSession and a store path).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("--seeds", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--budget", type=int, default=200)
    ap.add_argument("--budget-scale", type=int, default=1)
    ap.add_argument("--record-order", action="store_true")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("deepcrawl4ai_spark_crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from deepcrawl4ai_spark.frontier import webgraph as WG
    from deepcrawl4ai_spark.frontier.engine import CrawlEngine, EngineConfig

    eng = CrawlEngine(
        spark,
        args.store,
        EngineConfig(
            global_budget=args.budget,
            max_rounds=args.rounds,
            budget_scale=args.budget_scale,
            record_order=args.record_order,
        ),
    )
    metrics = eng.run(WG.gen_seeds(args.seeds))
    for m in metrics:
        print(
            json.dumps(
                {k: v for k, v in m.items() if k not in ("crawl_order", "per_partition")}
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
