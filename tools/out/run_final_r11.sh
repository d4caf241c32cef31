#!/bin/bash
# Round-11 end-of-round chain: fresh sf0.1+sf1.0 benches, full pytest
# suite, oracle selfcheck sweep at both SFs.
cd /root/repo
python bench.py > tools/out/bench_sf01_r11c.json.tmp 2> tools/out/bench_sf01_r11c.log
grep -o '{"metric".*' tools/out/bench_sf01_r11c.json.tmp > tools/out/bench_sf01_r11c.json
SPARK_GRAFT_SF_DIR=/tmp/pufs_sf1.0 python bench.py > tools/out/bench_sf1_r11c.json.tmp 2> tools/out/bench_sf1_r11c.log
grep -o '{"metric".*' tools/out/bench_sf1_r11c.json.tmp > tools/out/bench_sf1_r11c.json
rm -f tools/out/*_r11c.json.tmp
touch tools/out/DONE_bench_r11c

python -m pytest tests/ -q > tools/out/pytest_r11.log 2>&1
echo "rc=$?" >> tools/out/pytest_r11.log
touch tools/out/DONE_pytest_r11

python tools/verify_oracle.py > tools/out/oracle_sf001_r11.txt 2>&1
echo "rc=$?" >> tools/out/oracle_sf001_r11.txt
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/verify_oracle.py > tools/out/oracle_sf01_r11.txt 2>&1
echo "rc=$?" >> tools/out/oracle_sf01_r11.txt
touch tools/out/DONE_oracle_r11
