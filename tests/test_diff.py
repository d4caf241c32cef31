"""Merkle snapshot diff: file-level edits, whole-subtree add/remove,
and pruning (identical subtrees must not be descended)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pufs_spark.catalog import queries
from pufs_spark.catalog.datastore import ROOT_INODE, DataStore
from pufs_spark.plans import diff, merkle
from pufs_spark.sources.remote import MemRemote


def _build(tmp_path, name, edits):
    ds = DataStore(str(tmp_path / name), remote=MemRemote())
    keep = ds.mkdir(ROOT_INODE, "keep")
    ds.add_immutable_bytes(keep, "same.dat", b"same-bytes")
    mod = ds.mkdir(ROOT_INODE, "mod")
    ds.add_immutable_bytes(mod, "edit.dat", edits["edit"])
    if edits.get("extra"):
        ds.add_immutable_bytes(mod, "extra.dat", b"extra")
    if edits.get("olddir"):
        old = ds.mkdir(ROOT_INODE, "olddir")
        ds.add_immutable_bytes(old, "gone.dat", b"gone")
    if edits.get("newdir"):
        new = ds.mkdir(ROOT_INODE, "newdir")
        ds.add_immutable_bytes(new, "fresh.dat", b"fresh")
    ds.freeze()
    return ds


def test_merkle_diff_kinds_and_pruning(spark, tmp_path):
    a = _build(tmp_path, "a", {"edit": b"v1", "olddir": True})
    b = _build(tmp_path, "b", {"edit": b"v2", "extra": True, "newdir": True})
    da = queries.nodes_df(spark, a)
    db = queries.nodes_df(spark, b)
    out = {
        (r["path"], r["change"], r["is_dir"])
        for r in diff.merkle_diff(da, db).collect()
    }
    assert out == {
        ("/mod/edit.dat", "changed", False),
        ("/mod/extra.dat", "added", False),
        ("/olddir", "removed", True),  # subtree top only, not gone.dat
        ("/newdir", "added", True),
    }
    # pruning: /keep identical in both → never reported, never descended
    assert not any(p.startswith("/keep") for p, _, _ in out)


def test_merkle_diff_identical_trees_empty(spark, tmp_path):
    a = _build(tmp_path, "ia", {"edit": b"same"})
    b = _build(tmp_path, "ib", {"edit": b"same"})
    da = queries.nodes_df(spark, a)
    db = queries.nodes_df(spark, b)
    assert diff.merkle_diff(da, db).count() == 0


def test_merkle_diff_distributed_frozen(spark, tmp_path):
    """Diff over trees frozen by the DISTRIBUTED freeze plan (bids from
    freeze_nodes_df, not the driver) — same answer."""
    a = _build(tmp_path, "fa", {"edit": b"one"})
    b = _build(tmp_path, "fb", {"edit": b"two"})

    def refreeze(ds):
        nodes = queries.nodes_df(spark, ds).withColumn(
            "bid",
            F.when(F.col("is_dir"), F.lit(None)).otherwise(F.col("bid")),
        )
        return merkle.freeze_nodes_df(nodes)

    out = {
        (r["path"], r["change"])
        for r in diff.merkle_diff(refreeze(a), refreeze(b)).collect()
    }
    assert out == {("/mod/edit.dat", "changed")}
