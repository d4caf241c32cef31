"""Distributed (level-wise) Merkle freeze must agree with the
driver-side recursive freeze, plus the derived-FS-tree builders."""

from pyspark.sql import functions as F

from pufs_spark.catalog import queries
from pufs_spark.catalog.datastore import ROOT_INODE, DataStore
from pufs_spark.operators import intervals
from pufs_spark.plans import fstree, merkle
from pufs_spark.sources.remote import MemRemote
from tests.conftest import SF_DIR


def test_distributed_freeze_matches_driver(spark, tmp_path):
    ds = DataStore(str(tmp_path / "s"), remote=MemRemote())
    a = ds.mkdir(ROOT_INODE, "a")
    b = ds.mkdir(a, "b")
    ds.add_immutable_bytes(b, "f1", b"one")
    ds.add_immutable_bytes(a, "f2", b"two")
    ds.add_immutable_bytes(ROOT_INODE, "top", b"three")
    driver_root_bid = ds.freeze()

    # rebuild the same tree WITHOUT dir bids and freeze distributed
    nodes = queries.nodes_df(spark, ds).withColumn(
        "bid", F.when(F.col("is_dir"), F.lit(None)).otherwise(F.col("bid"))
    )
    frozen = merkle.freeze_nodes_df(nodes)
    got = {r["inode"]: r["bid"] for r in frozen.collect()}
    for inode, node in ds.nodes.items():
        assert got[inode] == node.bid, f"inode {inode}"
    assert got[ROOT_INODE] == driver_root_bid


def test_unpushed_anti_join(spark, tmp_path):
    ds = DataStore(str(tmp_path / "s"), remote=MemRemote())
    ds.add_immutable_bytes(ROOT_INODE, "f1", b"one")
    ds.add_immutable_bytes(ROOT_INODE, "f2", b"two")
    ds.freeze()
    nodes = queries.nodes_df(spark, ds)
    inventory = spark.createDataFrame(
        [(ds.get_node(ds.resolve_path("/f1")).bid,)], "bid string"
    )
    missing = merkle.unpushed(nodes, inventory)
    assert missing.count() == 2  # f2 + root dir


def test_fs_tree_shape(spark):
    nodes = fstree.fs_nodes(spark, SF_DIR)
    by_kind = (
        nodes.groupBy("is_dir").count().collect()
    )
    counts = {r["is_dir"]: r["count"] for r in by_kind}
    assert counts[False] > 100  # order files
    assert counts[True] > 30  # root + regions + nations + customers
    # parent integrity: every parent exists and is a dir
    parents = nodes.select(F.col("parent").alias("inode")).distinct()
    dirs = nodes.where("is_dir").select("inode")
    assert parents.join(dirs, "inode", "left_anti").count() == 0
    # unique (parent, name)
    dup = nodes.groupBy("parent", "name").count().where("count > 1")
    assert dup.count() == 0


def test_fs_regions_mask(spark):
    regions = fstree.fs_regions(spark, SF_DIR)
    mask = intervals.merge_intervals(regions)
    assert intervals.validate_mask(mask).count() == 0
    # overlapping line slots must have merged: fewer mask rows than log rows
    assert mask.count() < regions.count()


def test_memoized_freeze_skips_frozen_subtrees(spark, tmp_path):
    """Dirty-bit pruning: a dir with a pre-set bid is returned as-is
    (proven by a sentinel no hash could produce); null-bid dirs
    recompute — ancestors of the sentinel embed it (differ from a clean
    freeze), unrelated dirs match the clean freeze exactly."""
    ds = DataStore(str(tmp_path / "s"), remote=MemRemote())
    a = ds.mkdir(ROOT_INODE, "a")
    b = ds.mkdir(a, "b")
    c = ds.mkdir(ROOT_INODE, "c")
    ds.add_immutable_bytes(b, "f1", b"one")
    ds.add_immutable_bytes(c, "f2", b"two")
    ds.freeze()
    nodes = queries.nodes_df(spark, ds)

    clean = nodes.withColumn(
        "bid", F.when(F.col("is_dir"), F.lit(None)).otherwise(F.col("bid"))
    )
    expected = {
        r["inode"]: r["bid"]
        for r in merkle.freeze_nodes_df(clean).where("is_dir").collect()
    }

    patched = clean.withColumn(
        "bid",
        F.when(F.col("inode") == b, F.lit("SENTINEL")).otherwise(F.col("bid")),
    )
    out = {
        r["inode"]: r["bid"]
        for r in merkle.freeze_nodes_df(patched, memoized=True)
        .where("is_dir")
        .collect()
    }
    assert out[b] == "SENTINEL"          # frozen subtree untouched
    assert out[c] == expected[c]          # dirty sibling recomputed
    assert out[a] != expected[a]          # ancestors embed the sentinel
    assert out[ROOT_INODE] != expected[ROOT_INODE]
