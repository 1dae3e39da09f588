#!/bin/sh
# VERDICT r5 #7: per-host instantaneous concurrency cap, ON vs OFF, over a
# real wire with the mega-host skew frontier (r05 skew-wire flags verbatim).
set -e
cd /root/repo
python tools/cpu_ceiling.py > BENCH/ceiling_r06_cap_pre.json 2>/dev/null || true
for CAP in 0 16 8; do
  CRAWL_N_HOSTS=200 CRAWL_PAGE_SCALE=510000 SPARK_DRIVER_MEMORY=48g \
  python tools/bench_scaling.py --cores 16 --frontier 1000000 --rounds 2 \
      --budget 150000 --budget-scale 15000 --fetch-work-ms 2.0 \
      --skew-hot 0.5 --verify-politeness --transport http \
      --wire-delay-ms 20.0 --fetch-concurrency 10 \
      --per-host-concurrency "$CAP" \
      --out "BENCH/skew_wire_r06_cap${CAP}.json" \
      2>capleg_${CAP}.err | tail -1
  rm -rf /dev/shm/scalestore* /dev/shm/spark_local_* 2>/dev/null || true
done
python tools/cpu_ceiling.py > BENCH/ceiling_r06_cap_post.json 2>/dev/null || true
echo CAP_LEGS_DONE
