"""ANN-at-scale leg: the committed IVF recall panel driven over the
deterministic 16-cluster embedding fixture at 250k and 10^6 vectors —
two orders of magnitude beyond the registered fixture (1k) — measuring
probe-1/probe-2 recall@5 against brute-force truth and the wall cost of
the whole measurement.

Centroid stride: an ODD seed_mod means the sampled centroid ids
(multiples of seed_mod) cover all 16 true-cluster residues mod 16, one
each, at stride n/16 — so the IVF structure has exactly one coarse cell
per true cluster at every corpus size and recall is comparable across
legs. The search path is the registered operator's shape: broadcast
centroids (16 rows) + broadcast queries (10) + WindowGroupLimit top-5
inside the probed cells; only the truth side is all-pairs (10 queries ×
corpus — a measurement, not a pipeline op).

Usage: PYTHONPATH=. python tools/bench_ann_scale.py [--vecs 250000,1000000]
Writes one JSON line; redirect into BENCH/ann_scale_r{N}.json.
"""

from __future__ import annotations

import json
import sys
import time

VEC_COUNTS = (250_000, 1_000_000)
K = 16  # true clusters in the fixture AND coarse cells per leg


def _stride(n: int) -> int:
    """Largest odd stride ≤ n/K, so multiples of it inside [0, n) number
    ≥ K and cover all K residues mod 16 (gcd(odd, 16) = 1)."""
    s = n // K
    return s - 1 if s % 2 == 0 else s


def main() -> int:
    from pyspark.sql import functions as F

    from deepcrawl4ai_spark.operators.similarity import (
        _ivf_recall_panel_from,
        synth_clustered_embeddings,
    )
    from deepcrawl4ai_spark.session import get_spark

    counts = list(VEC_COUNTS)
    argv = sys.argv[1:]
    if "--vecs" in argv:
        counts = [int(x) for x in argv[argv.index("--vecs") + 1].split(",")]

    spark = get_spark("bench_ann_scale", cores=32)
    legs = {}
    for n in counts:
        emb = synth_clustered_embeddings(spark, n).localCheckpoint()
        seed_mod = _stride(n)
        n_cents = (n + seed_mod - 1) // seed_mod

        t0 = time.monotonic()
        panel = _ivf_recall_panel_from(emb, seed_mod, floor=0.8)
        rows = panel.collect()
        dt = time.monotonic() - t0

        r1 = sum(r["recall_p1"] for r in rows) / len(rows)
        r2 = sum(r["recall_p2"] for r in rows) / len(rows)
        legs[str(n)] = {
            "vectors": n,
            "centroids": n_cents,
            "queries": len(rows),
            "mean_recall_p1": round(r1, 4),
            "mean_recall_p2": round(r2, 4),
            "monotone_ok": all(r["monotone_ok"] for r in rows),
            "floor_ok_all": all(r["floor_ok"] for r in rows),
            "panel_sec": round(dt, 2),
            "usec_per_vec": round(1e6 * dt / n, 1),
        }
        print(f"# {n}: cents={n_cents} recall_p1={r1:.4f} recall_p2={r2:.4f} "
              f"floor_ok={all(r['floor_ok'] for r in rows)} {dt:.1f}s",
              file=sys.stderr)

    base = legs[str(counts[0])]
    top = legs[str(counts[-1])]
    print(json.dumps({
        "metric": "ann_ivf_recall_p2_at_scale",
        "value": top["mean_recall_p2"],
        "unit": "recall@5",
        "legs": legs,
        "usec_per_vec_ratio": round(
            top["usec_per_vec"] / base["usec_per_vec"], 3
        ),
        "cores": 32,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
