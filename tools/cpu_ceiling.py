"""Measure this machine's raw 8→32-process CPU scaling ceiling.

Pure embarrassingly-parallel pbkdf2 across N processes — zero coordination,
zero shuffle, zero Spark. Whatever efficiency THIS gives is the hardware's
upper bound for any 8-vs-32 comparison on this box (shared cloud VM:
hypervisor steal rises under full load). Engine efficiency in
BENCH/BASELINE.md is reported both raw and normalized by this ceiling.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import time


def _work(n: int) -> None:
    for i in range(n):
        hashlib.pbkdf2_hmac("sha256", b"x%d" % i, b"s", 2500)


def bench(procs: int, total: int = 96_000) -> float:
    per = total // procs
    ps = [mp.Process(target=_work, args=(per,)) for _ in range(procs)]
    t0 = time.time()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return time.time() - t0


def quick_probe(total: int = 24_000) -> dict:
    """One fast 8-vs-32 leg (~3 s) — the same-epoch steal snapshot bench.py
    embeds before/after its suite (VERDICT r4 #2) so a headline number can
    be read against the hypervisor weather it was recorded in. Single run
    per width (no min-of-2): this is a weather gauge, not the ceiling
    protocol — use main() for the recorded scaling ceilings."""
    t8 = bench(8, total=total)
    t32 = bench(32, total=total)
    return {
        "t8_sec": round(t8, 2),
        "t32_sec": round(t32, 2),
        "ceiling_efficiency": round((t8 / t32) / 4, 3),
    }


def main() -> None:
    # warm-up
    bench(8, total=8_000)
    t8 = min(bench(8) for _ in range(2))
    t32 = min(bench(32) for _ in range(2))
    print(
        json.dumps(
            {
                "t8_sec": round(t8, 2),
                "t32_sec": round(t32, 2),
                "speedup_8_to_32": round(t8 / t32, 2),
                "ceiling_efficiency": round((t8 / t32) / 4, 3),
            }
        )
    )
    # the 4→16 pair leaves 16 vCPUs of headroom on this 32-vCPU VM (no SMT
    # sibling contention, less steal) — a fairer stand-in for two separate
    # clusters, and the pair BENCH/BASELINE.md's primary numbers use
    t4 = min(bench(4, total=48_000) for _ in range(2))
    t16 = min(bench(16, total=48_000) for _ in range(2))
    print(
        json.dumps(
            {
                "t4_sec": round(t4, 2),
                "t16_sec": round(t16, 2),
                "speedup_4_to_16": round(t4 / t16, 2),
                "ceiling_efficiency_4_16": round((t4 / t16) / 4, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
