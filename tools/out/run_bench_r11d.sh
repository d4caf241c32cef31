#!/bin/bash
cd /root/repo
python bench.py > tools/out/bench_sf01_r11d.json.tmp 2> tools/out/bench_sf01_r11d.log
grep -o '{"metric".*' tools/out/bench_sf01_r11d.json.tmp > tools/out/bench_sf01_r11d.json
SPARK_GRAFT_SF_DIR=/tmp/pufs_sf1.0 python bench.py > tools/out/bench_sf1_r11d.json.tmp 2> tools/out/bench_sf1_r11d.log
grep -o '{"metric".*' tools/out/bench_sf1_r11d.json.tmp > tools/out/bench_sf1_r11d.json
rm -f tools/out/*_r11d.json.tmp
touch tools/out/DONE_bench_r11d
