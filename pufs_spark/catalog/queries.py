"""DataFrame query layer over the catalog tables.

These are the distributed counterparts of the reference's read API —
they take ``nodes`` / ``regions`` DataFrames (from DataStore.nodes_df()
at small scale, or from a billion-row parquet/Delta catalog at lake
scale) and return DataFrames. Plans to note (.explain-verified):

- L1/L2 are scans with an equality predicate on ``parent`` — pushed to
  the parquet scan and pruned when the catalog is clustered by parent
  (the reference gets the same locality from its (parent‖name) KV keys,
  core/nodedb.go:469-476).
- L3 joins listing rows with per-block region stats; the stats side is
  an aggregate over the merged mask. The join broadcasts when small.
- resolve_path is an iterative narrow join per component against a tiny
  broadcast catalog slice (reference loop: core/datastore.go:1355-1370).
- subtree/descendants is level-synchronous BFS — one self-join per tree
  level, not per node (reference DFS: core/datastore.go:1074-1114).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pufs_spark.catalog import schemas
from pufs_spark.catalog.datastore import ROOT_INODE, DataStore
from pufs_spark.operators import intervals


def nodes_df(spark: SparkSession, ds: DataStore) -> DataFrame:
    """Export the driver-side catalog as a DataFrame."""
    rows = []
    for n in ds.nodes.values():
        rs = None
        if n.remote_source is not None:
            s = n.remote_source
            rs = (s.kind, s.bucket, s.key, s.generation, s.url, s.etag, s.size)
        rows.append(
            (
                n.inode,
                n.parent,
                n.name,
                n.is_dir,
                n.size,
                None,  # mtime set below from epoch float
                n.is_dirty,
                n.bid,
                n.deferred,
                n.local_path,
                rs,
            )
        )
    df = spark.createDataFrame(rows, schema=schemas.NODES)
    mtimes = spark.createDataFrame(
        [(n.inode, float(n.mtime)) for n in ds.nodes.values()],
        "inode long, _mt double",
    )
    return (
        df.drop("mtime")
        .join(mtimes, "inode")
        .withColumn("mtime", F.timestamp_seconds(F.col("_mt")))
        .drop("_mt")
        .select([f.name for f in schemas.NODES.fields])
    )


def dir_listing(
    nodes: DataFrame, parent: int, include_dots: bool = False
) -> DataFrame:
    """L1: (name, inode) under a parent, name-sorted. Parquet scan order
    is not key order, so the sort is explicit (SURVEY §2.10)."""
    out = nodes.where(
        (F.col("parent") == parent) & (F.col("inode") != ROOT_INODE)
    ).select("name", "inode")
    if include_dots:
        spark = nodes.sparkSession
        parent_of = nodes.where(F.col("inode") == parent).select(
            F.lit(".").alias("name"), F.col("inode")
        )
        grandparent = nodes.where(F.col("inode") == parent).select(
            F.lit("..").alias("name"), F.col("parent").alias("inode")
        )
        out = parent_of.unionByName(grandparent).unionByName(out)
        _ = spark
    return out.orderBy("name")


def walk_dir_contents(nodes: DataFrame, parent: int | DataFrame) -> DataFrame:
    """L2: full DirEntry rows for a dir. In the DataFrame model the
    node record rides on the edge row, so the reference's
    listing⨝node join (core/datastore.go:391-443) collapses into a
    filtered projection — the join reappears in L3.

    ``parent`` may be a literal inode or a 1-row DataFrame with a
    ``_parent`` column (a scalar subquery): the latter keeps
    parent-discovery inside the same Spark plan — one job instead of a
    collect-then-requery round trip."""
    wanted = ["inode", "name", "is_dirty", "is_dir", "size", "mtime", "bid"]
    cols = [c for c in wanted if c in nodes.columns]
    if isinstance(parent, DataFrame):
        scoped = nodes.join(
            F.broadcast(parent), F.col("parent") == F.col("_parent")
        ).drop("_parent")
    else:
        scoped = nodes.where(F.col("parent") == parent)
    return (
        scoped.where(F.col("inode") != ROOT_INODE)
        .select(cols)
        .orderBy("name")
    )


def extended_dir_contents(
    nodes: DataFrame, regions: DataFrame, parent: int | DataFrame
) -> DataFrame:
    """L3: L2 ⨝ per-block cache stats (reference:
    core/datastore.go:445-466 + freezer.go:249-263). ``regions`` is the
    raw append-only log; the merged-mask aggregate happens here."""
    entries = walk_dir_contents(nodes, parent)
    # Semi-join the log down to the listing's blocks BEFORE the merge:
    # the mask window then sorts a dozen blocks' intervals, not the
    # whole table's — the difference between a per-listing job and a
    # full-log shuffle at lake scale.
    listed = regions.join(
        F.broadcast(entries.select("bid").where(F.col("bid").isNotNull())),
        "bid",
        "left_semi",
    )
    stats = intervals.coverage_stats(intervals.merge_intervals(listed))
    return (
        entries.join(F.broadcast(stats), "bid", "left")
        .withColumn(
            "populated_region_count",
            F.coalesce(F.col("populated_region_count"), F.lit(0)).cast("long"),
        )
        .withColumn(
            "populated_size",
            F.coalesce(F.col("populated_size"), F.lit(0)).cast("long"),
        )
        .select(
            [f.name for f in schemas.DIR_ENTRY.fields if f.name in entries.columns]
            + ["populated_region_count", "populated_size"]
        )
        # Same total order as orderBy("name") (one partition holds the
        # whole listing, names are unique within a dir), WITHOUT the
        # range-exchange: rangepartitioning needs partition bounds, so
        # Spark runs a separate SAMPLING pass over the join output
        # before the real map stage — one extra job and a second scan
        # of the stream side per listing (measured r16: L3 ran 7 jobs,
        # two of them this sort's sample+map twins). A listing is
        # returned to one client and is dir-sized, so a single-task
        # sort IS the scalable shape — repartition(1) keeps the
        # upstream join parallel and sorts only the final rows.
        .repartition(1)
        .sortWithinPartitions("name")
    )


def resolve_path(nodes: DataFrame, path: str) -> DataFrame:
    """P5 distributed: one narrow join per path component. Returns a
    1-row DataFrame with the resolved node (empty if missing)."""
    current = nodes.where(F.col("inode") == ROOT_INODE).select(
        F.col("inode").alias("_cur")
    )
    for comp in [c for c in path.split("/") if c]:
        if comp == ".":
            continue
        if comp == "..":
            current = (
                current.join(nodes, F.col("_cur") == F.col("inode"))
                .select(F.col("parent").alias("_cur"))
            )
            continue
        current = (
            nodes.where(F.col("name") == comp)
            .join(F.broadcast(current), F.col("parent") == F.col("_cur"))
            .select(F.col("inode").alias("_cur"))
        )
    return nodes.join(
        F.broadcast(current), F.col("inode") == F.col("_cur")
    ).drop("_cur")


def descendants(nodes: DataFrame, root: int, max_depth: int = 64) -> DataFrame:
    """A3/F2 support: all nodes under ``root`` (inclusive),
    level-synchronous BFS — one broadcast join per level, batched
    (SURVEY §7.5.2: batch per level, never per row)."""
    frontier = nodes.where(F.col("inode") == root).select("inode")
    out = frontier
    for _ in range(max_depth):
        frontier = (
            nodes.join(
                F.broadcast(frontier.withColumnRenamed("inode", "_p")),
                F.col("parent") == F.col("_p"),
            )
            .where(F.col("inode") != ROOT_INODE)
            .select("inode")
        )
        if frontier.isEmpty():
            break
        out = out.unionByName(frontier)
    return nodes.join(out.distinct(), "inode")


def descendants_multi(
    nodes: DataFrame, roots: DataFrame, max_depth: int = 64
) -> DataFrame:
    """A3 support: descendants of MANY roots in one plan — the frontier
    carries its origin root, so N subtree aggregations need one BFS, not
    N driver-looped jobs. ``roots`` must have (root_inode); returns
    (inode, root_inode) for every node under any root (exclusive)."""
    frontier = roots.select(
        F.col("root_inode").alias("_cur"), "root_inode"
    )
    acc: DataFrame | None = None
    for _ in range(max_depth):
        frontier = (
            nodes.join(
                F.broadcast(frontier), F.col("parent") == F.col("_cur")
            )
            .where(F.col("inode") != ROOT_INODE)
            .select(F.col("inode").alias("_cur"), "root_inode")
            .localCheckpoint()
        )
        if frontier.isEmpty():
            break
        step = frontier.select(F.col("_cur").alias("inode"), "root_inode")
        acc = step if acc is None else acc.unionByName(step)
    if acc is None:
        spark = nodes.sparkSession
        return spark.createDataFrame([], "inode long, root_inode long")
    return acc


def expand_deferred_distributed(
    deferred: DataFrame, lister_factory
) -> DataFrame:
    """L4/L6 distributed: fan one-level listings of MANY deferred
    prefixes out over executors (the reference's parallel warm-up,
    fs/monitor.go:71-109; Spark's own InMemoryFileIndex does the same
    for partition discovery). ``deferred`` needs (inode, key); returns
    child rows (parent, name, is_dir, size, key) ready to append to the
    catalog. One remote connection per partition, one task per batch of
    prefixes — never a driver loop."""

    def part(rows):
        lister = lister_factory()
        for row in rows:
            key = row["key"] or ""
            for name, is_dir, size in lister.list_prefix(key):
                child_key = (key.rstrip("/") + "/" + name).lstrip("/")
                yield (row["inode"], name, is_dir, size, child_key)

    return deferred.select("inode", "key").rdd.mapPartitions(part).toDF(
        "parent long, name string, is_dir boolean, size long, key string"
    )


def unpushed_bids(nodes: DataFrame, pushed: DataFrame, root: int) -> DataFrame:
    """F2/U4 distributed: bids reachable from root that are not in the
    remote inventory — a left-anti join (the reference's DFS + IsPushed
    filter, core/datastore.go:1074-1114)."""
    local = (
        descendants(nodes, root)
        .where(
            F.col("bid").isNotNull()
            & ~(~F.col("is_dir") & F.col("remote_source").isNotNull())
        )
        .select("bid")
        .distinct()
    )
    return local.join(pushed, "bid", "left_anti")
