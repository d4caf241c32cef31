"""Distributed Merkle freeze / push — the level-wise DataFrame variant
of F1-F3 for catalogs too big for driver recursion.

Reference: bottom-up memoized freeze (core/datastore.go:1116-1199),
collect-unpushed DFS (core/datastore.go:1074-1114), sequential push loop
(core/datastore.go:999-1072, comment at :1032 'could do in parallel' —
here it IS parallel: uploads run executor-side per partition).

Plan shape per tree level (deepest first):
    children = nodes at depth d
    manifests = children.groupBy(parent)
                 .agg(sha2(concat of sorted child lines))
    nodes     = nodes join manifests  (broadcast: one level of dirs)
Only dirty nodes re-hash (memoization = filter bid IS NULL), so an
incremental freeze touches just the dirty paths' levels — the same
asymptotics as the reference's dirty-bit pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pufs_spark.catalog.datastore import ROOT_INODE


def with_depth(nodes: DataFrame, max_depth: int = 64) -> DataFrame:
    """Annotate each node with its depth (root=0) via iterative
    broadcast joins, one per level — batched, never per-row."""
    frontier = nodes.where(F.col("inode") == ROOT_INODE).select(
        "inode", F.lit(0).alias("depth")
    )
    all_levels = frontier
    for d in range(1, max_depth + 1):
        frontier = (
            nodes.join(
                F.broadcast(
                    frontier.select(F.col("inode").alias("_p"))
                ),
                F.col("parent") == F.col("_p"),
            )
            .where(F.col("inode") != ROOT_INODE)
            .select("inode", F.lit(d).alias("depth"))
        )
        if frontier.isEmpty():
            break
        all_levels = all_levels.unionByName(frontier)
    return nodes.join(all_levels, "inode")


def _manifest_line():
    """One child's manifest line — MUST match
    catalog.datastore.encode_dir_manifest: name\\tis_dir\\tbid\\tsize."""
    return F.concat_ws(
        "\t",
        F.col("name"),
        F.when(F.col("is_dir"), F.lit("1")).otherwise(F.lit("0")),
        F.col("bid"),
        F.col("size").cast("string"),
    )


def freeze_level(dirs_at_level: DataFrame, children: DataFrame) -> DataFrame:
    """Compute dir BIDs for one level given fully-frozen children:
    bid = sha2( join(sorted lines, '\\n') + '\\n' ).
    Returns (inode, bid) for the level's dirs."""
    manifests = (
        children.withColumn("_line", _manifest_line())
        .groupBy(F.col("parent").alias("_mparent"))
        .agg(
            F.concat(
                F.array_join(F.array_sort(F.collect_list("_line")), "\n"),
                F.lit("\n"),
            ).alias("_manifest")
        )
    )
    return (
        dirs_at_level.select("inode")
        .join(manifests, F.col("inode") == F.col("_mparent"), "left")
        .select(
            "inode",
            F.sha2(F.coalesce(F.col("_manifest"), F.lit("")), 256).alias("bid"),
        )
    )


def freeze_nodes_df(nodes: DataFrame, max_depth: int = 64) -> DataFrame:
    """F1 distributed: returns nodes with dir bids filled bottom-up.
    File nodes must already carry bids (content hashing happens at
    ingest: sha2 over binaryFile content — see ingest_files)."""
    spark = nodes.sparkSession
    leveled = with_depth(nodes, max_depth).cache()
    max_d = leveled.agg(F.max("depth")).collect()[0][0] or 0
    frozen = leveled.where(~F.col("is_dir") | F.col("bid").isNotNull())
    for d in range(max_d - 1 if max_d else 0, -1, -1):
        dirs = leveled.where((F.col("depth") == d) & F.col("is_dir")).drop(
            "bid"
        )
        kids = frozen.where(F.col("depth") == d + 1)
        bids = freeze_level(dirs, kids)
        dirs_with_bids = dirs.join(bids, "inode").select(*frozen.columns)
        frozen = frozen.where(
            ~((F.col("depth") == d) & F.col("is_dir"))
        ).unionByName(dirs_with_bids)
        _ = spark
    return frozen.drop("depth")


def ingest_files(binary_df: DataFrame) -> DataFrame:
    """S8 distributed: content-address a binaryFile scan —
    (path, bid, size). The CAS write itself is a foreachPartition of
    put-if-absent (sources.remote layout)."""
    return binary_df.select(
        F.col("path"),
        F.sha2(F.col("content"), 256).alias("bid"),
        F.length(F.col("content")).cast("long").alias("size"),
    )


def unpushed(frozen_nodes: DataFrame, remote_inventory: DataFrame) -> DataFrame:
    """F2/U4: distinct local bids minus the remote CAS set — one
    left-anti join instead of the reference's per-node DFS probe."""
    local = frozen_nodes.where(F.col("bid").isNotNull()).select("bid").distinct()
    return local.join(remote_inventory, "bid", "left_anti")


def push_blocks(to_push: DataFrame, remote_factory, freezer_root: str) -> int:
    """F3 distributed upload: foreachPartition put-if-absent. The
    factory is a picklable zero-arg callable building a RemoteStore on
    the executor (connections are never shipped)."""
    from pufs_spark.sources.cas import Freezer

    def upload(rows):
        remote = remote_factory()
        freezer = Freezer(freezer_root)
        n = 0
        for row in rows:
            remote.put_block_if_absent(row["bid"], freezer.get_bytes(row["bid"]))
            n += 1
        yield n

    counts = to_push.select("bid").rdd.mapPartitions(upload).collect()
    return sum(counts)
