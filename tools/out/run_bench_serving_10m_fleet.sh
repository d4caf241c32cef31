#!/bin/bash
cd /tmp
export BENCH_INODES=10000000 BENCH_SECONDS=15 BENCH_CLIENTS=4 BENCH_FLEET=""
python /root/repo/tools/bench_serving.py \
  > /root/repo/tools/out/bench_serving_10m_r10d.json \
  2> /root/repo/tools/out/bench_serving_10m_r10d.log
echo "rc=$?" >> /root/repo/tools/out/bench_serving_10m_r10d.log
touch /root/repo/tools/out/DONE_bench_serving_10m_r10d
