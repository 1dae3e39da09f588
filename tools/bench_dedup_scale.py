"""Corpus-scale near-dup dedup leg: the committed MinHash pipeline
(LSH candidates → exact shingle-Jaccard verify → min-label-propagation
clusters → keeper anti-join) driven over a synthetic corpus two orders of
magnitude beyond sf0.1's documents table (5k docs → up to 10^6).

The corpus is deterministic and generated distributed from spark.range —
no external data, no driver loop:

- every doc is 30 words drawn from a bounded 2,000-word vocabulary
  (word = md5 prefix of a hash64-selected vocab index), so the
  inverted-index verify join sees realistic shingle fan-in;
- docs with doc_id % 17 == 1 are PLANTED near-duplicates of doc_id - 1:
  same word seed with positions 5 and 17 replaced — shingle Jaccard
  ~22/34 ≈ 0.65, so 8 one-row minhash bands catch a pair with
  p = 1 - (1-j)^8 ≈ 0.97 and the 0.04 verify threshold keeps it.

Because ground truth is known by construction, the leg measures the
PRODUCTION pipeline's recall at a scale where an all-pairs oracle is
impossible — plus per-stage wall time and per-doc cost across corpus
sizes (the flatness claim: the pipeline is linear in docs, never
all-pairs).

Usage: PYTHONPATH=. python tools/bench_dedup_scale.py [--docs 250000,1000000]
Writes one JSON line; redirect into BENCH/dedup_scale_r{N}.json.
"""

from __future__ import annotations

import json
import sys
import time

DOC_COUNTS = (250_000, 1_000_000)
VOCAB = 2000
N_WORDS = 30
MUT_POS = (5, 17)
PLANT_MOD = 17  # doc_id % 17 == 1 → near-dup of doc_id - 1


def _corpus(spark, n_docs: int):
    """Deterministic corpus: doc_id, text. Pure narrow plan from
    spark.range (no shuffle): per position j, the word is the md5-prefix
    of hash64(base_seed, j) % VOCAB; planted dups replace MUT_POS words
    with doc-unique tokens."""
    from pyspark.sql import functions as F

    base = (
        f"id - (CASE WHEN id % {PLANT_MOD} = 1 AND id > 0 THEN 1 ELSE 0 END)"
    )
    word = (
        f"CASE WHEN id % {PLANT_MOD} = 1 AND id > 0 AND j IN {MUT_POS} "
        f"THEN substr(md5(concat('mut', id, '_', j)), 1, 6) "
        f"ELSE substr(md5(cast(pmod(xxhash64({base}, j), {VOCAB}) as string)), 1, 6) "
        f"END"
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"array_join(transform(sequence(0, {N_WORDS - 1}), j -> {word}), ' ')"
        ).alias("text"),
    )


def main() -> int:
    from pyspark.sql import functions as F

    from deepcrawl4ai_spark.operators.dedup import (
        MINHASH_PARAMS,
        _minhash_cands,
        _verified_pairs,
        _lp_step,
    )
    from deepcrawl4ai_spark.session import get_spark

    counts = list(DOC_COUNTS)
    argv = sys.argv[1:]
    if "--docs" in argv:
        counts = [int(x) for x in argv[argv.index("--docs") + 1].split(",")]

    spark = get_spark("bench_dedup_scale", cores=32)
    legs = {}
    for n in counts:
        docs = _corpus(spark, n).localCheckpoint()  # materialize generation
        planted = (n - 2 + PLANT_MOD) // PLANT_MOD  # ids 1, 18, 35, ... < n

        t0 = time.monotonic()
        cands = _minhash_cands(docs, MINHASH_PARAMS).localCheckpoint()
        n_cands = cands.count()
        t_cand = time.monotonic() - t0

        t0 = time.monotonic()
        verified = _verified_pairs(docs, cands).localCheckpoint()
        n_verified = verified.count()
        t_verify = time.monotonic() - t0

        # recall against the planted truth (doc1 = i-1, doc2 = i)
        truth_hit = verified.filter(
            (F.col("doc2") % PLANT_MOD == 1) & (F.col("doc1") == F.col("doc2") - 1)
        ).count()

        t0 = time.monotonic()
        pairs = verified.select("doc1", "doc2")
        edges = (
            pairs.unionByName(
                pairs.select(F.col("doc2").alias("doc1"), F.col("doc1").alias("doc2"))
            )
            .distinct()
            .localCheckpoint()
        )
        labels = docs.select("doc_id", F.col("doc_id").alias("cluster"))
        for _ in range(3):
            labels = _lp_step(edges, labels)
        survivors = docs.join(
            labels.filter(F.col("cluster") != F.col("doc_id")).select("doc_id"),
            "doc_id",
            "left_anti",
        )
        n_survivors = survivors.count()
        t_apply = time.monotonic() - t0

        total = t_cand + t_verify + t_apply
        legs[str(n)] = {
            "docs": n,
            "planted_dups": planted,
            "candidate_pairs": n_cands,
            "verified_pairs": n_verified,
            "planted_caught": truth_hit,
            "recall": round(truth_hit / planted, 4),
            "survivors": n_survivors,
            "removed": n - n_survivors,
            "sec_candidates": round(t_cand, 2),
            "sec_verify": round(t_verify, 2),
            "sec_cluster_apply": round(t_apply, 2),
            "sec_total": round(total, 2),
            "usec_per_doc": round(1e6 * total / n, 1),
        }
        print(f"# {n}: cands={n_cands} verified={n_verified} "
              f"recall={truth_hit / planted:.4f} survivors={n_survivors} "
              f"total={total:.1f}s ({1e6 * total / n:.1f} us/doc)",
              file=sys.stderr)

    base = legs[str(counts[0])]
    top = legs[str(counts[-1])]
    print(json.dumps({
        "metric": "dedup_pipeline_usec_per_doc",
        "value": top["usec_per_doc"],
        "unit": "usec",
        "legs": legs,
        # linearity: per-doc cost at the top count vs the base count;
        # ~1.0 means the pipeline is linear in corpus size (never all-pairs)
        "usec_per_doc_ratio": round(
            top["usec_per_doc"] / base["usec_per_doc"], 3
        ),
        "cores": 32,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
