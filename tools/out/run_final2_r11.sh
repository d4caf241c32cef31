#!/bin/bash
cd /root/repo
python -m pytest tests/ -q > tools/out/pytest_r11b.log 2>&1
echo "rc=$?" >> tools/out/pytest_r11b.log
touch tools/out/DONE_pytest_r11b
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/verify_oracle.py M1_media_stats M2_media_features S1_cosine_topk > tools/out/oracle_spot_r11e.txt 2>&1
echo "rc=$?" >> tools/out/oracle_spot_r11e.txt
python bench.py > tools/out/bench_sf01_r11e.json.tmp 2> tools/out/bench_sf01_r11e.log
grep -o '{"metric".*' tools/out/bench_sf01_r11e.json.tmp > tools/out/bench_sf01_r11e.json
SPARK_GRAFT_SF_DIR=/tmp/pufs_sf1.0 python bench.py > tools/out/bench_sf1_r11e.json.tmp 2> tools/out/bench_sf1_r11e.log
grep -o '{"metric".*' tools/out/bench_sf1_r11e.json.tmp > tools/out/bench_sf1_r11e.json
rm -f tools/out/*_r11e.json.tmp
touch tools/out/DONE_final2_r11
