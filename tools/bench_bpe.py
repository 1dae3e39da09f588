"""BPE merge-loop scaling leg (VERDICT r5 #6): 8 merges proves the
pattern; real tokenizers run 10^4-10^5. This bench runs _bpe_learn at
increasing merge counts at sf0.1 and reports seconds-per-merge — the claim
under test is that per-iteration cost is bounded by the VOCAB dict (one
corpus-scale shuffle total, at iteration 0) and plan depth is constant via
localCheckpoint truncation, so sec/merge stays ~flat as merges grow.

Usage: PYTHONPATH=. python tools/bench_bpe.py [--sf-dir DIR] [--merges 8,64]
Writes one JSON line; redirect into BENCH/bpe64_r{N}.json.
"""

from __future__ import annotations

import json
import sys
import time

SF_DIR = "/root/testdata/sf0.1"
MERGE_COUNTS = (8, 64)


def main() -> int:
    from deepcrawl4ai_spark.operators.textops import _bpe_learn
    from deepcrawl4ai_spark.session import get_spark
    from deepcrawl4ai_spark.sources.tables import load_table

    sf_dir = SF_DIR
    merges = list(MERGE_COUNTS)
    argv = sys.argv[1:]
    if "--sf-dir" in argv:
        sf_dir = argv[argv.index("--sf-dir") + 1]
    if "--merges" in argv:
        merges = [int(x) for x in argv[argv.index("--merges") + 1].split(",")]
    # the testdata corpus draws from a fixed word pool, so its merge space
    # exhausts at ~89 productive merges at EVERY sf (r07 measurement). The
    # 10^3-merge regime needs a richer vocabulary: --synthetic-vocab N
    # builds a deterministic corpus of N docs x 50 md5-hex words (8-12
    # chars over a 16-symbol alphabet — a deep pair space), generated
    # distributed from spark.range; no external data.
    synth_docs = 0
    if "--synthetic-vocab" in argv:
        synth_docs = int(argv[argv.index("--synthetic-vocab") + 1])

    spark = get_spark("bench_bpe", cores=32)
    if synth_docs:
        from pyspark.sql import functions as F

        docs = (
            spark.range(synth_docs * 50)
            .select(
                (F.col("id") % synth_docs).alias("doc_id"),
                F.expr(
                    "substr(md5(cast(id as string)), 1, 8 + cast(id % 5 as int))"
                ).alias("w"),
            )
            .groupBy("doc_id")
            .agg(F.concat_ws(" ", F.collect_list("w")).alias("text"))
        )
    else:
        docs = load_table(spark, sf_dir, "documents")
    docs.count()  # warm the scan cache out of the measurement

    legs = {}
    for n in merges:
        depths: list[int] = []
        t0 = time.monotonic()
        out, _vocab = _bpe_learn(docs, n_merges=n, plan_depths=depths)
        rows = out.count()
        dt = time.monotonic() - t0
        legs[str(n)] = {
            "merges_requested": n,
            "merges_done": rows,
            "seconds": round(dt, 3),
            "sec_per_merge": round(dt / max(rows, 1), 4),
            "plan_depths_distinct": len(set(depths)),
            "plan_depth": depths[0] if depths else None,
        }
        print(f"# {n} merges: {dt:.1f}s, {dt / max(rows, 1):.3f}s/merge, "
              f"plan depths distinct={len(set(depths))}", file=sys.stderr)

    base = legs[str(merges[0])]
    top = legs[str(merges[-1])]
    print(json.dumps({
        "metric": "bpe_sec_per_merge",
        "value": top["sec_per_merge"],
        "unit": "sec",
        "sf_dir": sf_dir if not synth_docs else f"synthetic-vocab:{synth_docs}",
        "legs": legs,
        # flatness: sec/merge at the top count vs the base count; the base
        # includes the one-off corpus shuffle, so ratio < ~1.2 means the
        # marginal merge cost is dict-bounded, not corpus-bounded
        "sec_per_merge_ratio": round(
            top["sec_per_merge"] / base["sec_per_merge"], 3
        ),
        "plan_depth_constant": all(
            v["plan_depths_distinct"] == 1 for v in legs.values()
        ),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
