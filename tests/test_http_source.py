"""S4/S5 HTTP range connector tests, plus generation/ETag pinning on
read paths (reference: remote/http.go:22-72, remote/gcs.go:302-331).

Runs against an in-process stdlib-based server (tests/httpserver_util),
so everything here exercises real sockets, Range/If-Match headers, and
executor-side fetches in local mode.
"""

from __future__ import annotations

import os

import pytest

from pufs_spark.catalog.datastore import ROOT_INODE, DataStore, RemoteSource
from pufs_spark.catalog.errors import NotFoundError, StaleReadError
from pufs_spark.sources import sparse
from pufs_spark.sources.http import HTTPLister, HTTPRemote, http_attrs, read_url
from pufs_spark.sources.remote import LocalFSLister

from tests.httpserver_util import RangeETagHandler, start_server


@pytest.fixture()
def served_tree(tmp_path):
    root = tmp_path / "bucket"
    for d in range(3):
        (root / f"dir{d}" / "sub").mkdir(parents=True)
        (root / f"dir{d}" / "a.bin").write_bytes(b"A" * (10 + d))
        (root / f"dir{d}" / "sub" / "b.bin").write_bytes(b"B" * (20 + d))
    (root / "top.bin").write_bytes(b"TOP")
    srv, url = start_server(str(root))
    yield str(root), url
    srv.shutdown()


# -- S5: attr probe ------------------------------------------------------


def test_http_attrs_head(served_tree):
    root, url = served_tree
    attrs = http_attrs(f"{url}/top.bin")
    assert attrs.size == 3
    assert attrs.etag and attrs.etag.startswith('"')


def test_http_attrs_missing(served_tree):
    _, url = served_tree
    with pytest.raises(NotFoundError):
        http_attrs(f"{url}/nope.bin")


# -- S4: ranged read -----------------------------------------------------


def test_ranged_read(served_tree):
    root, url = served_tree
    assert read_url(f"{url}/dir1/a.bin") == b"A" * 11
    assert read_url(f"{url}/dir1/a.bin", offset=2, length=4) == b"AAAA"
    assert read_url(f"{url}/top.bin", offset=1) == b"OP"
    # range past EOF clamps to empty / short (sparse-cache contract)
    assert read_url(f"{url}/top.bin", offset=100, length=10) == b""
    assert read_url(f"{url}/top.bin", offset=1, length=100) == b"OP"


def test_if_match_pinning(served_tree):
    root, url = served_tree
    etag = http_attrs(f"{url}/top.bin").etag
    assert read_url(f"{url}/top.bin", etag=etag) == b"TOP"
    with open(os.path.join(root, "top.bin"), "wb") as f:
        f.write(b"CHANGED")
    with pytest.raises(StaleReadError):
        read_url(f"{url}/top.bin", etag=etag)


def test_bounded_retries(served_tree):
    _, url = served_tree
    RangeETagHandler.fail_next = 2  # two 503s, then success
    try:
        assert read_url(f"{url}/top.bin", retries=3) == b"TOP"
    finally:
        RangeETagHandler.fail_next = 0
    RangeETagHandler.fail_next = 5  # more failures than retries → raises
    try:
        with pytest.raises(Exception):
            read_url(f"{url}/top.bin", retries=1)
    finally:
        RangeETagHandler.fail_next = 0


# -- lazy listing through HTTP (L4 over S4/S5) ---------------------------


def test_http_lister_listing_and_datastore(tmp_path, served_tree):
    _, url = served_tree
    lister = HTTPLister(url)
    names = [(n, d) for n, d, _s in lister.list_prefix("")]
    assert names == [
        ("dir0", True),
        ("dir1", True),
        ("dir2", True),
        ("top.bin", False),
    ]
    ds = DataStore(str(tmp_path / "store"), lister=lister)
    ds.link_remote(
        ROOT_INODE,
        "mnt",
        RemoteSource(kind="gcs", bucket="bucket", key=""),
        is_dir=True,
    )
    assert ds.read_path("/mnt/dir1/a.bin") == b"A" * 11
    assert ds.getattr(ds.resolve_path("/mnt/dir2/sub/b.bin"))["size"] == 22


def test_http_lister_stale_read_fails(tmp_path, served_tree):
    root, url = served_tree
    ds = DataStore(str(tmp_path / "store"), lister=HTTPLister(url))
    ds.link_remote(
        ROOT_INODE,
        "mnt",
        RemoteSource(kind="gcs", bucket="bucket", key=""),
        is_dir=True,
    )
    # expand the listing (pins ETags), then mutate the backing object
    ds.get_dir_contents(ds.resolve_path("/mnt/dir0"))
    with open(os.path.join(root, "dir0", "a.bin"), "wb") as f:
        f.write(b"MUTATED CONTENT")
    with pytest.raises(StaleReadError):
        ds.read_path("/mnt/dir0/a.bin")


def test_local_lister_stale_read_fails(tmp_path, served_tree):
    root, _ = served_tree
    ds = DataStore(str(tmp_path / "store"), lister=LocalFSLister(root))
    ds.link_remote(
        ROOT_INODE,
        "mnt",
        RemoteSource(kind="gcs", bucket="bucket", key=""),
        is_dir=True,
    )
    ds.get_dir_contents(ds.resolve_path("/mnt/dir0"))  # pins mtime_ns
    p = os.path.join(root, "dir0", "a.bin")
    with open(p, "wb") as f:
        f.write(b"MUTATED")
    os.utime(p, ns=(1, 1))  # force a generation change
    with pytest.raises(StaleReadError):
        ds.read_path("/mnt/dir0/a.bin")


# -- RemoteStore over HTTP (CAS/root/lease layout) -----------------------


def test_http_remote_cas_roundtrip(tmp_path):
    srv, url = start_server(str(tmp_path / "remote"))
    try:
        (tmp_path / "remote").mkdir(exist_ok=True)
        r = HTTPRemote(url)
        assert not r.has_block("b1")
        assert r.put_block_if_absent("b1", b"hello world")
        assert not r.put_block_if_absent("b1", b"hello world")  # U2: set
        assert r.has_block("b1")
        assert r.get_block("b1") == b"hello world"
        assert r.read_block("b1", 6, 5) == b"world"
        r.set_root("main", "b1")
        assert r.get_root("main") == "b1"
        with pytest.raises(KeyError):
            r.get_root("absent")
        r.set_lease("client-1", 12345.0)
    finally:
        srv.shutdown()


# -- sparse cache fetching over HTTP (T1/T2 over S4) ---------------------


def test_sparse_fetch_over_http(spark, tmp_path):
    remote_dir = tmp_path / "remote" / "CAS"
    remote_dir.mkdir(parents=True)
    payload = bytes(range(256)) * 4096  # 1 MiB
    (remote_dir / "bidX").write_bytes(payload)
    srv, url = start_server(str(tmp_path / "remote"))
    try:
        cache = str(tmp_path / "cache")
        data = sparse.read_through(
            spark,
            cache,
            lambda: HTTPRemote(url),
            "bidX",
            offset := 300_000,
            4096,
            readahead=0,
        )
        assert data == payload[offset : offset + 4096]
        # warm re-read: no remote traffic (driver fast-path)
        fz = sparse.SparseFreezer(cache)
        assert fz.read("bidX", offset, 4096) == data
        # tail read past EOF clamps
        tail = sparse.read_through(
            spark, cache, lambda: HTTPRemote(url), "bidX",
            len(payload) - 100, 4096, readahead=0,
        )
        assert tail == payload[-100:]
    finally:
        srv.shutdown()


# -- GCS connector gating ------------------------------------------------


def test_gcs_connector_gated():
    """The GCS connector imports cleanly and fails loudly (not silently)
    without google-cloud-storage in the environment."""
    from pufs_spark.sources import gcs

    with pytest.raises(NotImplementedError, match="google-cloud-storage"):
        gcs.GCSLister("bucket", "prefix")
    with pytest.raises(NotImplementedError, match="google-cloud-storage"):
        gcs.GCSRemote("bucket")
