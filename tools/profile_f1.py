#!/usr/bin/env python
"""F1 strategy cross-over probe (round 11): at sf1.0 the freeze is the
suite's #2 query (~6.2 s) and runs the single-task plan (1.65M-node
catalog < the 4M-row threshold). Times both strategies plus the shared
prep so the threshold is a measured cross-over, not a guess."""
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


def t(fn):
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/pufs_sf1.0")
    spark = get_spark(app_name="profile_f1")
    nodes = fstree.fs_nodes(spark, sf_dir).withColumn(
        "depth",
        F.when(F.col("inode") == 1, 0)
        .when(F.pmod(F.col("inode"), F.lit(10_000_000)) < 10, 1)
        .when(F.pmod(F.col("inode"), F.lit(10_000_000)) < 100, 2)
        .when(F.pmod(F.col("inode"), F.lit(10_000_000)) < 100000, 3)
        .otherwise(4),
    ).persist()
    n = nodes.count()
    out = {"rows": n, "sf_dir": sf_dir}
    # warm
    force(nodes)
    out["single_task"] = t(
        lambda: force(merkle.freeze_nodes_df(nodes, single_task_max_rows=1 << 40))
    )
    out["levelwise"] = t(
        lambda: force(merkle.freeze_nodes_df(nodes, single_task_max_rows=0))
    )
    out["single_task_2"] = t(
        lambda: force(merkle.freeze_nodes_df(nodes, single_task_max_rows=1 << 40))
    )
    out["levelwise_2"] = t(
        lambda: force(merkle.freeze_nodes_df(nodes, single_task_max_rows=0))
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
