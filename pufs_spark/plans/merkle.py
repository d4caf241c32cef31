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
    """Annotate each node with its depth (root=0) via pointer doubling:
    ceil(log2(max_depth)) self-joins, each advancing every node's
    ancestor pointer 2^i hops (root self-loops at distance 0, so
    converged rows are fixpoints). No driver actions, and — unlike
    level-synchronous BFS — no frontier broadcast, so it holds at
    billion-node catalogs where a frontier is itself huge.

    Fast path: a catalog that already carries a ``depth`` column (real
    catalogs store it — it's derivable at ingest and invariant under
    everything but rename-across-dirs) skips the doubling entirely."""
    if "depth" in nodes.columns:
        return nodes
    reach = nodes.select(
        "inode",
        F.col("parent").alias("anc"),
        F.when(F.col("inode") == ROOT_INODE, F.lit(0))
        .otherwise(F.lit(1))
        .cast("int")
        .alias("depth"),
    )
    rounds = max(1, (max_depth - 1).bit_length())
    for i in range(rounds):
        hop = reach.select(
            F.col("inode").alias("_j"),
            F.col("anc").alias("_janc"),
            F.col("depth").alias("_jd"),
        )
        reach = reach.join(hop, F.col("anc") == F.col("_j")).select(
            "inode",
            F.col("_janc").alias("anc"),
            (F.col("depth") + F.col("_jd")).alias("depth"),
        )
        # Lineage doubles per self-join round, so it must be cut — but
        # eager checkpoints cost a job each. Let the first three rounds
        # (8-hop reach, covers most FS trees) run as one lazy plan
        # (2^3 copies of a cheap base scan), then checkpoint + test
        # convergence each round for the deep-tree tail.
        if i >= 2:
            reach = reach.localCheckpoint()
            if reach.where(F.col("anc") != ROOT_INODE).isEmpty():
                break
    return nodes.join(reach.select("inode", "depth"), "inode")


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


def freeze_nodes_df(
    nodes: DataFrame,
    max_depth: int = 64,
    memoized: bool = False,
    checkpoint_every: int = 3,
) -> DataFrame:
    """F1 distributed: returns nodes with dir bids filled bottom-up.
    File nodes must already carry bids (content hashing happens at
    ingest: sha2 over binaryFile content — see ingest_files).

    ``memoized=True`` is the reference's dirty-bit pruning
    (core/datastore.go:1123-1125): dirs that already carry a bid are
    returned as-is and only null-bid (dirty) paths re-hash — safe
    because every mutation nulls bids up to the root (M8), so a set bid
    implies an unchanged subtree. An incremental freeze then touches
    only the dirty paths' levels.

    Level results are localCheckpoint'd every ``checkpoint_every``
    levels: level d's bids feed both level d-1's manifests and the
    final output, and Spark does not share common subplans across
    DataFrame references, so with no materialization the per-level work
    multiplies ~2^levels — but each checkpoint is an eager job, which
    for a shallow tree costs more than the 2^k-bounded lazy recompute
    it saves (measured at sf0.1: every-level 3.9s, every-3rd 2.5s,
    never 3.8s). k=3 bounds the blowup at 8 copies of a dir-count-
    sized frame while spending a third of the jobs. The checkpointed
    frames are dir-count-sized, not catalog-sized."""
    leveled = with_depth(nodes, max_depth).persist()
    max_d = leveled.agg(F.max("depth")).collect()[0][0] or 0
    prev_dir_bids: DataFrame | None = None
    level_bids: list[DataFrame] = []
    for i, d in enumerate(range(max_d, -1, -1)):
        dirs = leveled.where((F.col("depth") == d) & F.col("is_dir"))
        if memoized:
            pre = dirs.where(F.col("bid").isNotNull()).select("inode", "bid")
            dirs = dirs.where(F.col("bid").isNull())
        file_kids = leveled.where(
            (F.col("depth") == d + 1) & ~F.col("is_dir")
        ).select("parent", "name", "is_dir", "size", "bid")
        if prev_dir_bids is not None:
            dir_kids = (
                leveled.where((F.col("depth") == d + 1) & F.col("is_dir"))
                .drop("bid")
                .join(prev_dir_bids, "inode")
                .select("parent", "name", "is_dir", "size", "bid")
            )
            kids = file_kids.unionByName(dir_kids)
        else:
            kids = file_kids
        bids = freeze_level(dirs, kids)
        if memoized:
            bids = bids.unionByName(pre)
        if (i + 1) % max(checkpoint_every, 1) == 0:
            bids = bids.localCheckpoint()
        level_bids.append(bids)
        prev_dir_bids = bids
    all_dir_bids = level_bids[0]
    for b in level_bids[1:]:
        all_dir_bids = all_dir_bids.unionByName(b)
    files = leveled.where(~F.col("is_dir"))
    dirs_out = (
        leveled.where(F.col("is_dir"))
        .drop("bid")
        .join(all_dir_bids, "inode")
        .select(*files.columns)
    )
    return files.unionByName(dirs_out).drop("depth")


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


def block_edges(frozen: DataFrame) -> DataFrame:
    """The Merkle DAG as an edge table: (parent_bid, child_bid) for
    every dir manifest → member. Derived from a frozen catalog (no
    manifest decoding — the tree IS the graph)."""
    dirs = frozen.where(F.col("is_dir") & F.col("bid").isNotNull()).select(
        F.col("inode").alias("_di"), F.col("bid").alias("parent_bid")
    )
    return (
        frozen.where(F.col("bid").isNotNull())
        .join(dirs, F.col("parent") == F.col("_di"))
        .where(F.col("inode") != F.col("_di"))  # root self-edge
        .select("parent_bid", F.col("bid").alias("child_bid"))
        .distinct()
    )


def reachable_bids(
    edges: DataFrame, roots: DataFrame, max_depth: int = 64
) -> DataFrame:
    """All bids reachable from the live root set — level-synchronous
    BFS over the edge table, batch per level, frontier deduped against
    the seen set (shared subtrees visited once). Returns (bid)."""
    seen = roots.select("bid").distinct().localCheckpoint()
    frontier = seen
    for _ in range(max_depth):
        frontier = (
            edges.join(
                frontier.withColumnRenamed("bid", "parent_bid"), "parent_bid"
            )
            .select(F.col("child_bid").alias("bid"))
            .distinct()
            .join(seen, "bid", "left_anti")
            .localCheckpoint()
        )
        if frontier.isEmpty():
            break
        seen = seen.unionByName(frontier).localCheckpoint()
    return seen


def gc_candidates(all_blocks: DataFrame, reachable: DataFrame) -> DataFrame:
    """F6's designed-but-unbuilt GC (reference comment core/types.go:59):
    blocks no live root can reach — a left-anti join. Deleting them is a
    foreachPartition of the store's delete; leases guard racing
    publishers (reference: remote/gcs.go:96-112)."""
    return all_blocks.select("bid").distinct().join(
        reachable, "bid", "left_anti"
    )


def live_root_bids(spark, remote, now: float | None = None) -> DataFrame:
    """The GC root set as a DataFrame of (bid): every labeled root
    binding plus every UNEXPIRED lease's pinned bid (reference:
    ``Lease{Expiry, BID}``, remote/gcs.go:96-112 — a lease keeps a
    just-pushed or label-superseded root alive until it expires)."""
    import time as _time

    now = _time.time() if now is None else now
    bids = {bid for _label, bid in remote.get_roots()}
    bids |= {
        bid
        for _name, expiry, bid in remote.get_leases()
        if bid is not None and expiry > now
    }
    return spark.createDataFrame([(b,) for b in sorted(bids)], "bid string")


def remote_reachable_bids(
    roots: DataFrame, remote_factory, max_depth: int = 64
) -> DataFrame:
    """Reachability over the REMOTE CAS itself — no catalog needed:
    level-synchronous BFS from the live roots, each level fetching its
    dir manifests executor-side (mapPartitions with a per-partition
    RemoteStore) and emitting (child bid, is_dir) rows parsed with the
    same decode_dir_manifest the catalog uses. Shared subtrees are
    visited once (frontier anti-joined against the seen set); a parse
    or fetch failure on a live dir aborts the GC loudly rather than
    silently under-reaching (which would delete live data)."""
    from pufs_spark.catalog.datastore import decode_dir_manifest

    spark = roots.sparkSession

    def expand(rows):
        remote = remote_factory()
        for row in rows:
            for _name, is_dir, bid, _size in decode_dir_manifest(
                remote.get_block(row.bid)
            ):
                yield (bid, is_dir)

    seen = roots.select("bid").distinct().localCheckpoint()
    frontier = seen
    for _ in range(max_depth):
        kids = spark.createDataFrame(
            frontier.rdd.mapPartitions(expand), "bid string, is_dir boolean"
        )
        new = (
            kids.groupBy("bid")
            .agg(F.max("is_dir").alias("is_dir"))
            .join(seen, "bid", "left_anti")
            .localCheckpoint()
        )
        if new.isEmpty():
            break
        seen = seen.unionByName(new.select("bid")).localCheckpoint()
        frontier = new.where("is_dir").select("bid")
        if frontier.isEmpty():
            break
    return seen


def gc_delete(candidates: DataFrame, remote_factory) -> int:
    """F6 phase 2: the actual delete — foreachPartition-shaped removal
    through the RemoteStore (one connection per partition, same shape
    as push_blocks' uploads). Returns blocks actually deleted
    (already-gone blocks — e.g. a racing GC — don't count)."""

    def drop(rows):
        remote = remote_factory()
        n = 0
        for row in rows:
            if remote.delete_block(row["bid"]):
                n += 1
        yield n

    return sum(candidates.select("bid").rdd.mapPartitions(drop).collect())


def collect_garbage(
    spark,
    remote_factory,
    now: float | None = None,
    all_blocks: DataFrame | None = None,
    max_depth: int = 64,
) -> dict:
    """End-to-end F6 GC: live roots (labels + unexpired leases) →
    remote BFS reachability → anti-join against the CAS inventory →
    distributed delete. The reference designed-but-never-built exactly
    this pass (core/types.go:59).

    ``all_blocks`` overrides the driver-side ``remote.list_blocks()``
    enumeration — at 100TB feed it a bucket-inventory DataFrame
    instead of listing synchronously."""
    remote = remote_factory()
    roots = live_root_bids(spark, remote, now=now)
    if all_blocks is None:
        all_blocks = spark.createDataFrame(
            [(b,) for b in remote.list_blocks()], "bid string"
        )
    live = remote_reachable_bids(roots, remote_factory, max_depth=max_depth)
    candidates = gc_candidates(all_blocks, live).localCheckpoint()
    deleted = gc_delete(candidates, remote_factory)
    return {
        "roots": roots.count(),
        "live_blocks": live.count(),
        "deleted": deleted,
    }


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
