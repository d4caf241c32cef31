"""L4 (lazy remote-listing expansion) and L6 (distributed parallel
listing) tests against a local directory tree standing in for an
object-store prefix."""

from __future__ import annotations

import os

import pytest

from pufs_spark.catalog import queries as catq
from pufs_spark.catalog.datastore import ROOT_INODE, DataStore, RemoteSource
from pufs_spark.sources.remote import LocalFSLister


@pytest.fixture()
def remote_tree(tmp_path):
    root = tmp_path / "bucket"
    for d in range(3):
        (root / f"dir{d}" / "sub").mkdir(parents=True)
        (root / f"dir{d}" / "a.bin").write_bytes(b"A" * (10 + d))
        (root / f"dir{d}" / "sub" / "b.bin").write_bytes(b"B" * (20 + d))
    (root / "top.bin").write_bytes(b"TOP")
    return str(root)


def _link(tmp_path, remote_tree):
    ds = DataStore(
        str(tmp_path / "store"), lister=LocalFSLister(remote_tree)
    )
    mnt = ds.link_remote(
        ROOT_INODE,
        "mnt",
        RemoteSource(kind="gcs", bucket="bucket", key="", generation=None),
        is_dir=True,
    )
    return ds, mnt


def test_lazy_listing_expands_on_demand(tmp_path, remote_tree):
    ds, mnt = _link(tmp_path, remote_tree)
    # listing the mount expands exactly one level
    names = [n for n, _ in ds.get_dir_contents(mnt)]
    assert names == ["dir0", "dir1", "dir2", "top.bin"]
    # nested dirs stay deferred until touched
    d0 = ds.resolve_path("/mnt/dir0")
    assert ds.get_node(d0).deferred
    sub_names = [n for n, _ in ds.get_dir_contents(d0)]
    assert sub_names == ["a.bin", "sub"]


def test_lazy_read_through_and_cache(tmp_path, remote_tree):
    ds, _ = _link(tmp_path, remote_tree)
    assert ds.read_path("/mnt/dir1/a.bin") == b"A" * 11
    assert ds.read_path("/mnt/top.bin") == b"TOP"
    # cached under the synthetic bid: delete the remote file, read again
    os.unlink(os.path.join(remote_tree, "dir1", "a.bin"))
    assert ds.read_path("/mnt/dir1/a.bin") == b"A" * 11


def test_getattr_sizes_from_listing(tmp_path, remote_tree):
    ds, _ = _link(tmp_path, remote_tree)
    ino = ds.resolve_path("/mnt/dir2/sub/b.bin")
    assert ds.getattr(ino)["size"] == 22


def test_distributed_listing_matches_oswalk(spark, tmp_path, remote_tree):
    """One mapPartitions round per level; two rounds must discover the
    full tree exactly as os.walk sees it."""
    lister_factory = lambda: LocalFSLister(remote_tree)  # noqa: E731
    level0 = spark.createDataFrame([(1, "")], "inode long, key string")
    l1 = catq.expand_deferred_distributed(level0, lister_factory)
    rows1 = l1.collect()
    assert {r["name"] for r in rows1} == {"dir0", "dir1", "dir2", "top.bin"}

    next_deferred = (
        l1.where("is_dir")
        .selectExpr("cast(100 as long) as inode", "key")
    )
    l2 = catq.expand_deferred_distributed(next_deferred, lister_factory)
    rows2 = l2.collect()
    got = {(r["key"], r["size"]) for r in rows1 + rows2}

    expect = set()
    for dirpath, dirnames, filenames in os.walk(remote_tree):
        rel = os.path.relpath(dirpath, remote_tree)
        rel = "" if rel == "." else rel
        for d in dirnames:
            expect.add(((rel + "/" + d).lstrip("/"), 0))
        for f in filenames:
            p = os.path.join(dirpath, f)
            expect.add(((rel + "/" + f).lstrip("/"), os.path.getsize(p)))
    # two levels discovered so far: drop deeper-than-2 entries
    expect2 = {e for e in expect if e[0].count("/") <= 1}
    assert got == expect2


def test_freeze_forces_expansion(tmp_path, remote_tree):
    """Freezing a tree with an unexpanded remote mount must expand it
    first — manifests cover the real children."""
    ds, mnt = _link(tmp_path, remote_tree)
    root_bid = ds.freeze()
    assert root_bid is not None
    # after freeze, the subtree is fully materialized in the catalog
    assert ds.resolve_path("/mnt/dir0/sub/b.bin") > 0
