#!/bin/bash
# Wait until 1-min loadavg drops below $1 (default 2.0), up to $2 sec (default 600).
gate=${1:-2.0}; lim=${2:-600}; t=0
while :; do
  l=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(python3 -c "print(1 if $l < $gate else 0)")
  [ "$ok" = 1 ] && { echo "quiet: load $l"; exit 0; }
  [ $t -ge $lim ] && { echo "timeout: load $l"; exit 1; }
  sleep 10; t=$((t+10))
done
