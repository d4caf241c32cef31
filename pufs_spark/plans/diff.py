"""Merkle snapshot diff — compare two frozen trees, descending only
into subtrees whose dir bids differ (the content-addressed analog of
`git diff`; the reference's Merkle DAG makes this possible but ships no
diff — SURVEY §2.5's memoized freeze is the write-side half of the same
trick).

Cost is O(changed spine), not O(tree): an identical subtree is pruned
at its root by one bid comparison. Each level is a pair of
frontier-joins plus a full-outer match on (frontier, name); the
frontier carries accumulated paths, so output rows are human-readable
without a separate path-resolution pass.

Output: (path, change ∈ added|removed|changed, is_dir, a_inode,
b_inode). Added/removed SUBTREES are reported as their top row only
(descending into an unmatched subtree cannot prune anything — callers
wanting the full listing join descendants on the reported top).
Changed dirs are descended, not reported; changed files are reported.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pufs_spark.catalog.datastore import ROOT_INODE


def merkle_diff(
    frozen_a: DataFrame, frozen_b: DataFrame, max_depth: int = 64
) -> DataFrame:
    """Both inputs must be fully frozen (every node has a bid —
    plans/merkle.freeze_nodes_df or an exported frozen catalog)."""
    spark = frozen_a.sparkSession
    frontier = spark.createDataFrame(
        [(ROOT_INODE, ROOT_INODE, "")], "a_parent long, b_parent long, path string"
    )
    out_schema = (
        "path string, change string, is_dir boolean, a_inode long, b_inode long"
    )
    results: list[DataFrame] = []
    a_nodes = frozen_a.select(
        F.col("parent").alias("_ap"), F.col("inode").alias("a_inode"),
        "name", F.col("bid").alias("a_bid"), F.col("is_dir").alias("a_dir"),
    ).where(F.col("a_inode") != ROOT_INODE)
    b_nodes = frozen_b.select(
        F.col("parent").alias("_bp"), F.col("inode").alias("b_inode"),
        F.col("name").alias("b_name"), F.col("bid").alias("b_bid"),
        F.col("is_dir").alias("b_dir"),
    ).where(F.col("b_inode") != ROOT_INODE)

    for _ in range(max_depth):
        kids_a = a_nodes.join(
            F.broadcast(frontier), F.col("_ap") == F.col("a_parent")
        ).select("path", "name", "a_inode", "a_bid", "a_dir")
        kids_b = b_nodes.join(
            F.broadcast(frontier), F.col("_bp") == F.col("b_parent")
        ).select(
            F.col("path").alias("b_path"), "b_name", "b_inode", "b_bid", "b_dir"
        )
        m = kids_a.join(
            kids_b,
            (F.col("path") == F.col("b_path")) & (F.col("name") == F.col("b_name")),
            "full_outer",
        ).select(
            F.coalesce(F.col("path"), F.col("b_path")).alias("path"),
            F.coalesce(F.col("name"), F.col("b_name")).alias("name"),
            "a_inode", "a_bid", "a_dir", "b_inode", "b_bid", "b_dir",
        ).withColumn("child_path", F.concat(F.col("path"), F.lit("/"), F.col("name")))

        removed = m.where(F.col("b_inode").isNull()).select(
            F.col("child_path").alias("path"), F.lit("removed").alias("change"),
            F.col("a_dir").alias("is_dir"), "a_inode",
            F.lit(None).cast("long").alias("b_inode"),
        )
        added = m.where(F.col("a_inode").isNull()).select(
            F.col("child_path").alias("path"), F.lit("added").alias("change"),
            F.col("b_dir").alias("is_dir"),
            F.lit(None).cast("long").alias("a_inode"), "b_inode",
        )
        changed_files = m.where(
            F.col("a_inode").isNotNull()
            & F.col("b_inode").isNotNull()
            & (F.col("a_bid") != F.col("b_bid"))
            & ~F.col("a_dir")
        ).select(
            F.col("child_path").alias("path"), F.lit("changed").alias("change"),
            F.lit(False).alias("is_dir"), "a_inode", "b_inode",
        )
        results += [removed, added, changed_files]

        # descend ONLY where both sides are dirs with differing bids
        frontier = (
            m.where(
                F.col("a_inode").isNotNull()
                & F.col("b_inode").isNotNull()
                & F.col("a_dir") & F.col("b_dir")
                & (F.col("a_bid") != F.col("b_bid"))
            )
            .select(
                F.col("a_inode").alias("a_parent"),
                F.col("b_inode").alias("b_parent"),
                F.col("child_path").alias("path"),
            )
            .localCheckpoint()
        )
        if frontier.isEmpty():
            break

    out = spark.createDataFrame([], out_schema)
    for r in results:
        out = out.unionByName(r)
    return out
