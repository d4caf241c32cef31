#!/bin/bash
cd /root/repo
python -m pytest tests/ -q > /root/repo/tools/out/full_suite_r10_final2.log 2>&1
echo "rc=$?" >> /root/repo/tools/out/full_suite_r10_final2.log
touch /root/repo/tools/out/DONE_full_suite_final2
