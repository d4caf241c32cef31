#!/usr/bin/env python
"""F1 bench-pattern profile: 5 consecutive freeze runs in ONE session
(the bench's n=5 shape) so storage-pressure effects across runs are
visible — the r11c suite showed F1 at 8.9 s median while the isolated
warm profile said 6.1 s, and the gap is what this script measures."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pufs_spark.plans import fstree, merkle
from pufs_spark.session import get_spark

from pyspark.sql import functions as F


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/pufs_sf1.0")
    spark = get_spark(app_name="profile_f1_suite")

    def nodes():
        return fstree.fs_nodes(spark, sf_dir).withColumn(
            "depth",
            F.when(F.col("inode") == 1, 0)
            .when(F.pmod(F.col("inode"), F.lit(10_000_000)) < 10, 1)
            .when(F.pmod(F.col("inode"), F.lit(10_000_000)) < 100, 2)
            .when(F.pmod(F.col("inode"), F.lit(10_000_000)) < 100000, 3)
            .otherwise(4)
            .cast("int"),
        )

    force(nodes())  # warm footers
    runs = []
    for _ in range(5):
        t0 = time.monotonic()
        frozen = merkle.freeze_nodes_df(nodes())
        force(frozen.where(F.col("is_dir")).select("inode", "bid"))
        runs.append(round(time.monotonic() - t0, 3))
    runs_sorted = sorted(runs)
    print(json.dumps({
        "runs_in_order": runs,
        "median": runs_sorted[2],
        "sf_dir": sf_dir,
    }))


if __name__ == "__main__":
    main()
