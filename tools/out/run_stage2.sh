#!/bin/bash
cd /root/repo
# wait for the 10M chain (one Spark at a time — shared Derby metastore)
while [ ! -f tools/out/DONE_10M ]; do sleep 30; done
echo "=== soak smoke sf0.01 start $(date -u +%H:%M:%S) ===" > tools/out/stage2.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SOAK_MAINT=1 SOAK_BATCHES=8 \
  python tools/soak_ingest.py > tools/out/soak_smoke.json 2>> tools/out/stage2.log
rc=$?
echo "=== soak smoke rc=$rc $(date -u +%H:%M:%S) ===" >> tools/out/stage2.log
if [ $rc -eq 0 ]; then
  echo "=== soak full sf0.1 start $(date -u +%H:%M:%S) ===" >> tools/out/stage2.log
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SOAK_MAINT=1 SOAK_BATCHES=24 \
    python tools/soak_ingest.py > tools/out/soak_maint_sf01.json 2>> tools/out/stage2.log
  echo "=== soak full rc=$? $(date -u +%H:%M:%S) ===" >> tools/out/stage2.log
fi
echo "=== sf1.0 bench start $(date -u +%H:%M:%S) ===" >> tools/out/stage2.log
SPARK_GRAFT_SF_DIR=/tmp/pufs_sf1.0 python bench.py \
  > tools/out/bench_sf1.json 2>> tools/out/stage2.log
echo "=== sf1.0 bench rc=$? $(date -u +%H:%M:%S) ===" >> tools/out/stage2.log
touch tools/out/DONE_STAGE2
