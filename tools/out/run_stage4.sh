#!/bin/bash
cd /root/repo
echo "=== pytest start $(date -u +%H:%M:%S) ===" > tools/out/stage4.log
python -m pytest tests/ -q -x > tools/out/pytest_r10.log 2>&1
echo "=== pytest rc=$? $(date -u +%H:%M:%S) ===" >> tools/out/stage4.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py > tools/out/bench_sf01_r10.json 2>> tools/out/stage4.log
echo "=== bench rc=$? $(date -u +%H:%M:%S) ===" >> tools/out/stage4.log
touch tools/out/DONE_STAGE4
