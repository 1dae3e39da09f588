#!/bin/sh
# Round-7 north-rule scaling pair: identical flags to rounds 2-6
# (CLAUDE.md protocol), legs serial, ceilings bracketing the pair.
set -e
cd /root/repo
python tools/cpu_ceiling.py > BENCH/ceiling_r07_scale_pre.json 2>/dev/null || true
for CORES in 4 16; do
  CRAWL_N_HOSTS=200 CRAWL_PAGE_SCALE=510000 SPARK_DRIVER_MEMORY=48g \
  python tools/bench_scaling.py --cores "$CORES" --frontier 1000000 --rounds 2 \
      --budget 150000 --budget-scale 120 --fetch-work-ms 20.0 \
      --out "BENCH/scale_r07_local${CORES}.json" \
      2>/tmp/scale_r07_${CORES}.err | tail -1
  rm -rf /dev/shm/scalestore* /dev/shm/spark_local_* 2>/dev/null || true
done
python tools/cpu_ceiling.py > BENCH/ceiling_r07_scale_post.json 2>/dev/null || true
echo SCALE_PAIR_DONE
