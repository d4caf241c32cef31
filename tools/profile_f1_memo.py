#!/usr/bin/env python
"""Decompose the MEMOIZED freeze floor at sf1.0 (r12): which part of a
0%-dirty freeze still costs ~4.4 s after the file-lines prune."""
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
    spark = get_spark(app_name="profile_f1_memo")
    depth = (
        F.when(F.col("inode") == 1, 0)
        .when(F.pmod(F.col("inode"), F.lit(10_000_000)) < 10, 1)
        .when(F.pmod(F.col("inode"), F.lit(10_000_000)) < 100, 2)
        .when(F.pmod(F.col("inode"), F.lit(10_000_000)) < 100000, 3)
        .otherwise(4)
        .cast("int")
    )
    nodes = fstree.fs_nodes(spark, sf_dir).withColumn("depth", depth)
    frozen = merkle.freeze_nodes_df(nodes).persist()
    frozen.count()
    # 0%-dirty: only the interior chain (root/region/nation) nulled
    redo = (
        frozen.withColumn(
            "bid",
            F.when(
                F.col("is_dir") & (F.col("inode") < 100),
                F.lit(None).cast("string"),
            ).otherwise(F.col("bid")),
        )
        .withColumn("depth", depth)
        .persist()
    )
    n = redo.count()
    out = {"rows": n}

    out["count_cached"] = t(lambda: redo.count())
    leveled = redo
    d_all = leveled.where(F.col("is_dir"))
    files = leveled.where(~F.col("is_dir"))
    dirty = d_all.where(F.col("bid").isNull()).select(
        F.col("inode").alias("parent")
    )
    pruned = files.join(F.broadcast(dirty), "parent", "left_semi")
    out["pruned_file_lines"] = t(lambda: force(
        pruned.withColumn("_line", merkle._manifest_line())
        .groupBy(F.col("parent").alias("inode"))
        .agg(F.collect_list("_line").alias("_flines"))
    ))
    interior = (
        d_all.where(F.col("parent") != F.col("inode"))
        .select(F.col("parent").alias("inode")).distinct()
    )
    out["interior_ids"] = t(lambda: force(interior))
    out["d_all_scan"] = t(lambda: force(d_all))
    out["files_scan_noop"] = t(lambda: force(files))
    # the single-task hash: time just the dir-frame assembly + task
    bids = merkle._freeze_dirs_single_task(leveled, memoized=True)
    out["dir_bids_task"] = t(lambda: force(bids))
    out["dir_bids_task_2"] = t(lambda: force(bids))
    # full memoized freeze for reference
    out["e2e_memoized"] = t(
        lambda: force(merkle.freeze_nodes_df(leveled, memoized=True))
    )
    # and the output-side: join-back + union, reusing a materialized bid
    # frame via localCheckpoint to isolate the tail
    bids_ck = bids.localCheckpoint()
    files_out = leveled.where(~F.col("is_dir"))
    dirs_out = (
        leveled.where(F.col("is_dir")).drop("bid")
        .join(F.broadcast(bids_ck), "inode")
        .select(*files_out.columns)
    )
    out["output_union_only"] = t(
        lambda: force(files_out.unionByName(dirs_out).drop("depth"))
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
