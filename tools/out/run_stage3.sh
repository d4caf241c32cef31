#!/bin/bash
cd /root/repo
while [ ! -f tools/out/DONE_STAGE2 ]; do sleep 30; done
echo "=== serving 10M rerun start $(date -u +%H:%M:%S) ===" > tools/out/stage3.log
BENCH_INODES=10000000 BENCH_SECONDS=15 BENCH_CLIENTS=4 BENCH_FLEET=1,2,4 \
  python tools/bench_serving.py > tools/out/serving_10m_v2.json 2>> tools/out/stage3.log
echo "=== serving rerun rc=$? $(date -u +%H:%M:%S) ===" >> tools/out/stage3.log
touch tools/out/DONE_STAGE3
