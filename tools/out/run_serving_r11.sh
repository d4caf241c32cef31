#!/bin/bash
# Chained: waits for the sf0.1/sf1.0 bench chain, smoke-gates the
# serving bench at 20k inodes, then runs the full 10M point.
while [ ! -f /root/repo/tools/out/DONE_bench_r11b ]; do sleep 10; done
cd /tmp
export BENCH_SECONDS=5 BENCH_CLIENTS=4 BENCH_FLEET="" BENCH_SKEW_SECONDS=8
BENCH_INODES=20000 python /root/repo/tools/bench_serving.py \
  > /root/repo/tools/out/bench_serving_smoke_r11.json \
  2> /root/repo/tools/out/bench_serving_smoke_r11.log
rc=$?
echo "rc=$rc" >> /root/repo/tools/out/bench_serving_smoke_r11.log
touch /root/repo/tools/out/DONE_serving_smoke_r11
if [ $rc -ne 0 ]; then exit 1; fi
export BENCH_INODES=10000000 BENCH_SECONDS=15 BENCH_SKEW_SECONDS=45
unset BENCH_HOT_FLEET BENCH_HOT_ISOLATED
python /root/repo/tools/bench_serving.py \
  > /root/repo/tools/out/bench_serving_10m_r11.json \
  2> /root/repo/tools/out/bench_serving_10m_r11.log
echo "rc=$?" >> /root/repo/tools/out/bench_serving_10m_r11.log
touch /root/repo/tools/out/DONE_serving_10m_r11
