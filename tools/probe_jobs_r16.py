#!/usr/bin/env python
"""Per-job timeline for selected headline queries: job description,
submission/completion wall offsets, to see which jobs run serially."""
import json, os, sys, time, urllib.request
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod
from pufs_spark.session import get_spark
import bench

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

def rest(app_path):
    with urllib.request.urlopen(f"http://127.0.0.1:4040/api/v1/applications{app_path}", timeout=10) as r:
        return json.load(r)

def main():
    names = sys.argv[1:] or ["L3_extended_listing", "Q5_local_supplier", "F1_merkle_freeze"]
    input_bytes = sum(os.path.getsize(os.path.join(dp, f)) for dp, _, fs in os.walk(SF_DIR) for f in fs)
    spark = get_spark(app_name="probe_jobs_r16", input_bytes=input_bytes,
                      extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    app_id = sc.applicationId
    qs = entrymod.queries()
    bench.force(qs["Q6_forecast_revenue"](spark, SF_DIR))
    for memo in ("_fs_nodes", "_fs_regions"):
        getattr(entrymod, memo)(spark, SF_DIR).count()
    from datetime import datetime
    def ts(s):  # "2026-08-18T10:20:30.123GMT"
        return datetime.strptime(s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").timestamp()
    for name in names:
        for rep in range(2):
            group = f"{name}_probe{rep}"
            sc.setJobGroup(group, name)
            t0 = time.monotonic()
            bench.force(qs[name](spark, SF_DIR))
            wall = time.monotonic() - t0
            sc.setJobGroup("idle", "idle")
            jobs = [j for j in rest(f"/{app_id}/jobs") if j.get("jobGroup") == group]
            jobs.sort(key=lambda j: j["jobId"])
            if rep == 0:
                continue  # warm the shapes; report run 2
            base = min(ts(j["submissionTime"]) for j in jobs)
            print(f"\n== {name} wall {wall:.3f}s, {len(jobs)} jobs")
            for j in jobs:
                sub = ts(j["submissionTime"]) - base
                dur = ts(j["completionTime"]) - ts(j["submissionTime"]) if j.get("completionTime") else -1
                print(f"  job {j['jobId']:4d} +{sub:6.3f}s dur {dur:6.3f}s tasks {j.get('numTasks'):4d}  {j.get('description','')[:90]}")
    spark.stop()

if __name__ == "__main__":
    main()
