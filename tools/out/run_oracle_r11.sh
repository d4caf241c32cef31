#!/bin/bash
cd /root/repo
python tools/verify_oracle.py > tools/out/oracle_sf001_r11.txt 2>&1
echo "rc=$?" >> tools/out/oracle_sf001_r11.txt
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/verify_oracle.py > tools/out/oracle_sf01_r11.txt 2>&1
echo "rc=$?" >> tools/out/oracle_sf01_r11.txt
touch tools/out/DONE_oracle_r11
