#!/usr/bin/env python
"""Memoized-freeze crossover (round 13, verdict task 5): at which dirty
fraction does the memoized plan's prune overhead (dirty-set broadcasts
+ semi-joins) stop paying for the file lines it skips?

Measures, at $SPARK_GRAFT_SF_DIR (default /tmp/pufs_sf1.0):
  - full freeze (memoized=False) as the bar;
  - memoized freeze at dirty fractions 0/1/5/10/25% of files (each
    dirty file nulls its parent dir's bid and the shared ancestor
    chain, like real mutations nulling bids root-ward).

Prints one JSON line; n runs per point, min+median recorded (this box
has steal spikes — mins are the comparable statistic, BASELINE.md).

Usage: SPARK_GRAFT_SF_DIR=/tmp/pufs_sf1.0 python tools/profile_f1_crossover.py [n]
"""
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


def runs_of(fn, n):
    walls = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        walls.append(round(time.monotonic() - t0, 3))
    walls.sort()
    return {"min": walls[0], "median": walls[n // 2], "runs": walls}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/pufs_sf1.0")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="profile_f1_crossover")
    nodes = fstree.fs_nodes(spark, sf_dir).withColumn(
        "depth",
        F.when(F.col("inode") == 1, 0)
        .when(F.pmod(F.col("inode"), F.lit(10_000_000)) < 10, 1)
        .when(F.pmod(F.col("inode"), F.lit(10_000_000)) < 100, 2)
        .when(F.pmod(F.col("inode"), F.lit(10_000_000)) < 100000, 3)
        .otherwise(4)
        .cast("int"),
    ).persist()
    nodes.count()
    out = {
        "sf_dir": sf_dir,
        "n": n,
        "load_start": round(os.getloadavg()[0], 1),
    }
    # untimed warmup: the freeze's codegen + Arrow paths JIT on first
    # execution; without it the first timed point absorbs ~10 s of C2
    # compile and the cross-point comparison is ordering-biased
    force(merkle.freeze_nodes_df(nodes))
    out["full"] = runs_of(lambda: force(merkle.freeze_nodes_df(nodes)), n)
    print("full:", out["full"], file=sys.stderr, flush=True)

    frozen = merkle.freeze_nodes_df(nodes).persist()
    frozen.count()
    for pct in (0.0, 0.01, 0.05, 0.10, 0.25):
        if pct == 0.0:
            dirty = F.lit(False)
        else:
            dirty = (~F.col("is_dir")) & (
                F.abs(F.hash("inode")) % 1000 < int(pct * 1000)
            )
        marked = frozen.withColumn("_dirty_file", dirty)
        dirty_parents = (
            marked.where(F.col("_dirty_file"))
            .select(F.col("parent").alias("inode"))
            .distinct()
        )
        redo = (
            marked.join(
                F.broadcast(dirty_parents.withColumn("_d", F.lit(True))),
                "inode",
                "left",
            )
            .withColumn(
                "bid",
                F.when(
                    F.col("is_dir")
                    & (
                        F.coalesce(F.col("_d"), F.lit(False))
                        | (F.col("inode") < 100)
                    ),
                    F.lit(None).cast("string"),
                ).otherwise(F.col("bid")),
            )
            .drop("_d", "_dirty_file")
            # freeze output DROPS depth; re-stamp it (pmod within the
            # key-stride block — the r12 profiler stamped without pmod,
            # which mis-depths every replica>0 dir on a tiled sf) or
            # every memoized freeze here would time the pointer-doubling
            # depth DERIVATION instead of the memo path (~+12 s, the
            # r13 false-regression this comment exists to prevent)
            .withColumn(
                "depth",
                F.when(F.col("inode") == 1, 0)
                .when(F.pmod(F.col("inode"), F.lit(10_000_000)) < 10, 1)
                .when(F.pmod(F.col("inode"), F.lit(10_000_000)) < 100, 2)
                .when(F.pmod(F.col("inode"), F.lit(10_000_000)) < 100000, 3)
                .otherwise(4)
                .cast("int"),
            )
            .persist()
        )
        redo.count()
        out[f"memo_{pct:g}"] = runs_of(
            lambda r=redo: force(merkle.freeze_nodes_df(r, memoized=True)), n
        )
        print(f"memo_{pct:g}:", out[f"memo_{pct:g}"], file=sys.stderr, flush=True)
        redo.unpersist()
    out["load_end"] = round(os.getloadavg()[0], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
