#!/usr/bin/env python
"""Bench-methodology single-query timer (noop sink, no UI): warmup
probe + fs memo, then N timed runs of each named query."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod
from pufs_spark.session import get_spark
import bench

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("PUFS_TIME_N", "6"))

def main():
    names = sys.argv[1:]
    input_bytes = sum(os.path.getsize(os.path.join(dp, f)) for dp, _, fs in os.walk(SF_DIR) for f in fs)
    spark = get_spark(app_name="time_query_r16", input_bytes=input_bytes)
    qs = entrymod.queries()
    bench.force(qs["Q6_forecast_revenue"](spark, SF_DIR))
    for memo in ("_fs_nodes", "_fs_regions"):
        getattr(entrymod, memo)(spark, SF_DIR).count()
    for name in names:
        runs = []
        for _ in range(N):
            t0 = time.monotonic()
            bench.force(qs[name](spark, SF_DIR))
            runs.append(round(time.monotonic() - t0, 3))
        srt = sorted(runs)
        print(f"{name:28s} min {srt[0]:6.3f} med {srt[len(srt)//2]:6.3f} runs {runs}", flush=True)
    spark.stop()

if __name__ == "__main__":
    main()
