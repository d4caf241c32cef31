#!/usr/bin/env python
"""Round-5 probe: time D1/R1 at sf0.1 and dump R1's physical plan."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pufs_spark.session import get_spark


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe_r5")
    qs = entrymod.queries()
    which = sys.argv[1:] or ["D1_minhash_lsh_neardup", "R1_missing_regions"]
    # warmup
    force(qs["Q6_forecast_revenue"](spark, sf_dir))
    for name in which:
        if name.startswith("plan:"):
            name = name[5:]
            df = qs[name](spark, sf_dir)
            print(f"==== {name} plan ====")
            print(df._jdf.queryExecution().executedPlan().toString()[:8000])
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            force(qs[name](spark, sf_dir))
            best = min(best, time.monotonic() - t0)
        print(f"{name}: {best:.3f}s")


if __name__ == "__main__":
    main()
