#!/usr/bin/env python
"""Round-13 probe: per-query walls (n runs, min+median) with loadavg
stamps so steal storms are visible in the record."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as e
from pufs_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pufs_sf1.0"
names = sys.argv[2].split(",") if len(sys.argv) > 2 else ["R1_missing_regions", "R2_interval_union"]
n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
spark = get_spark(app_name="probe_r13")
qs = e.queries()
def force(df): df.write.format("noop").mode("overwrite").save()
force(qs["Q6_forecast_revenue"](spark, sf_dir))  # warm
out = {"initial": spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "unset"),
       "load_start": round(os.getloadavg()[0], 1)}
for nm in names:
    runs = []
    for _ in range(n):
        t0 = time.monotonic(); force(qs[nm](spark, sf_dir)); runs.append(round(time.monotonic()-t0, 3))
    runs.sort()
    out[nm] = {"min": runs[0], "median": runs[len(runs)//2], "runs": runs,
               "load": round(os.getloadavg()[0], 1)}
print(json.dumps(out))
