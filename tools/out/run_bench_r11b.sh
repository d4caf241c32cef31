#!/bin/bash
cd /root/repo
python bench.py > tools/out/bench_sf01_r11b.json.tmp 2> tools/out/bench_sf01_r11b.log
grep -o '{"metric".*' tools/out/bench_sf01_r11b.json.tmp > tools/out/bench_sf01_r11b.json
SPARK_GRAFT_SF_DIR=/tmp/pufs_sf1.0 python bench.py > tools/out/bench_sf1_r11b.json.tmp 2> tools/out/bench_sf1_r11b.log
grep -o '{"metric".*' tools/out/bench_sf1_r11b.json.tmp > tools/out/bench_sf1_r11b.json
rm -f tools/out/bench_sf01_r11b.json.tmp tools/out/bench_sf1_r11b.json.tmp
touch tools/out/DONE_bench_r11b
