"""Per-query measurement harness for optimization work (guide §1.4/§1.5).

NOT the driver bench — bench.py stays frozen. This tool times individual
registered queries through the noop sink with N repeats in one warmed
session, printing per-query samples + min/median so A/B comparisons of
operator changes are possible despite hypervisor epoch noise.

Usage:
    python bench_extra.py [-n REPEATS] [--sf-dir DIR] [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

os.environ.setdefault("CRAWL_N_HOSTS", "100")
os.environ.setdefault("CRAWL_PAGE_SCALE", "10000")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: a slow-query panel)")
    ap.add_argument("-n", type=int, default=3, help="repeats per query")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    from deepcrawl4ai_spark.registry import QUERIES
    from deepcrawl4ai_spark.session import get_spark

    spark = get_spark("bench_extra", cores=args.cpus, shuffle_partitions=max(args.cpus, 16))
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(args.sf_dir, "nation.parquet")).count()
    from deepcrawl4ai_spark.frontier.fetcher import warm_pool

    warm_pool(spark)

    names = args.names or [
        "dedup_minhash_apply",
        "corpus_pipeline_v3",
        "corpus_pipeline_v2",
        "dedup_recall_minhash16",
        "dedup_recall_minhash",
        "dedup_semantic",
        "dedup_semantic_trained",
        "bpe_merges",
        "bpe_encode",
        "pack_sequences_bpe",
        "dedup_substring_apply",
        "host_pagerank",
    ]
    out: dict[str, dict] = {}
    for name in names:
        samples = []
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            QUERIES[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out[name] = {
            "samples": samples,
            "min": min(samples),
            "median": round(statistics.median(samples), 3),
        }
        print(f"{name:28s} min={out[name]['min']:7.2f} med={out[name]['median']:7.2f} {samples}", flush=True)
    spark.stop()
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({k: v["median"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
