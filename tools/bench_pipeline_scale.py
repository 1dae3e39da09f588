"""Full-funnel curation at corpus scale: corpus_pipeline_v3 — the
DCLM-flavored five-stage pipeline (entropy gate → learned quality gate
trained on survivors → corpus-wide near-dup cut → temperature sampling →
sequence packing) — driven over the same deterministic synthetic corpus
as bench_dedup_scale (planted near-duplicates at doc_id % 17 == 1) with a
deterministic 3-way lang column, at 250k and 10^6 documents: 200× the
sf0.1 documents table.

What the leg proves: the funnel's per-doc cost is bounded as the corpus
grows (every stage is scan-side codegen, a partial-agg shuffle, or the
near-dup chain already proven linear in bench_dedup_scale — no stage is
super-linear), the funnel counts stay monotone, and the dedup stage
removes the planted duplicates at scale.

Usage: PYTHONPATH=. python tools/bench_pipeline_scale.py [--docs 250000,1000000]
Writes one JSON line; redirect into BENCH/pipeline_scale_r{N}.json.
"""

from __future__ import annotations

import json
import sys
import time

DOC_COUNTS = (250_000, 1_000_000)
LANGS = ("en", "de", "fr")


def main() -> int:
    from pyspark.sql import functions as F

    from deepcrawl4ai_spark.operators.pipeline import _corpus_pipeline_v3_from
    from deepcrawl4ai_spark.session import get_spark
    from tools.bench_dedup_scale import PLANT_MOD, _corpus

    counts = list(DOC_COUNTS)
    argv = sys.argv[1:]
    if "--docs" in argv:
        counts = [int(x) for x in argv[argv.index("--docs") + 1].split(",")]

    spark = get_spark("bench_pipeline_scale", cores=32)
    legs = {}
    for n in counts:
        langs = ", ".join(f"'{x}'" for x in LANGS)
        docs = (
            _corpus(spark, n)
            .withColumn(
                "lang",
                F.expr(
                    f"element_at(array({langs}), "
                    f"cast(pmod(xxhash64(doc_id, 9973), {len(LANGS)}) as int) + 1)"
                ),
            )
            .localCheckpoint()
        )
        planted = (n - 2 + PLANT_MOD) // PLANT_MOD

        t0 = time.monotonic()
        out = _corpus_pipeline_v3_from(docs)
        head = out.select(
            "n_input", "n_entropy", "n_clf", "n_dedup", "n_final"
        ).first()
        n_rows = out.count()
        dt = time.monotonic() - t0

        funnel = [head[c] for c in ("n_input", "n_entropy", "n_clf", "n_dedup", "n_final")]
        legs[str(n)] = {
            "docs": n,
            "planted_dups": planted,
            "funnel": dict(
                zip(("n_input", "n_entropy", "n_clf", "n_dedup", "n_final"), funnel)
            ),
            "funnel_monotone": all(
                a >= b for a, b in zip(funnel, funnel[1:])
            ),
            "dedup_removed": head["n_clf"] - head["n_dedup"],
            "manifest_rows": n_rows,
            "sec_total": round(dt, 2),
            "usec_per_doc": round(1e6 * dt / n, 1),
        }
        print(f"# {n}: funnel={funnel} manifest={n_rows} "
              f"{dt:.1f}s ({1e6 * dt / n:.1f} us/doc)", file=sys.stderr)

    base = legs[str(counts[0])]
    top = legs[str(counts[-1])]
    print(json.dumps({
        "metric": "pipeline_v3_usec_per_doc",
        "value": top["usec_per_doc"],
        "unit": "usec",
        "legs": legs,
        "usec_per_doc_ratio": round(
            top["usec_per_doc"] / base["usec_per_doc"], 3
        ),
        "cores": 32,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
