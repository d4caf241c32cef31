#!/bin/bash
cd /root/repo
echo "=== serving 10M start $(date -u +%H:%M:%S) ===" > tools/out/bench_10m.log
BENCH_INODES=10000000 BENCH_SECONDS=15 BENCH_CLIENTS=4 BENCH_FLEET=1,2,4 \
  python tools/bench_serving.py > tools/out/serving_10m.json 2>> tools/out/bench_10m.log
echo "=== serving rc=$? $(date -u +%H:%M:%S) ===" >> tools/out/bench_10m.log
echo "=== rebuild 10M start $(date -u +%H:%M:%S) ===" >> tools/out/bench_10m.log
BENCH_INODES=10000000 \
  python tools/bench_mirror_rebuild.py > tools/out/rebuild_10m.json 2>> tools/out/bench_10m.log
echo "=== rebuild rc=$? $(date -u +%H:%M:%S) ===" >> tools/out/bench_10m.log
touch tools/out/DONE_10M
