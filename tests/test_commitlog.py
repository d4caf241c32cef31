"""Multi-writer catalog commits (catalog/commitlog.py).

The reference is single-writer by construction (one BoltDB tx,
core/datastore.go:666-735); these tests check the multi-writer analog:
optimistic version claims, journal rebase onto a winner's snapshot,
and loud conflicts on overlapping paths.
"""

import json
import os
import threading

import pytest

from pufs_spark.catalog import commitlog as CL
from pufs_spark.catalog import errors as E
from pufs_spark.catalog.datastore import ROOT_INODE, DataStore


def test_single_writer_roundtrip(tmp_path):
    root = str(tmp_path)
    store, log = CL.open_log(root)
    d = store.mkdir(ROOT_INODE, "data")
    store.add_immutable_bytes(d, "f1", b"hello")
    assert log.commit(store, writer="w1", message="init") == 0
    assert store.base_version == 0
    assert store._journal == []

    # a second opener sees the committed state
    store2, _ = CL.open_log(root)
    assert store2.base_version == 0
    assert store2.read_path("/data/f1") == b"hello"

    # versions are sequential and records well-formed
    store.mkdir(ROOT_INODE, "more")
    assert log.commit(store, writer="w1") == 1
    rec = log.read_record(1)
    assert rec["base_version"] == 0
    assert rec["writer"] == "w1"
    assert rec["touched"] == ["/more"]
    assert rec["ops"] == 1


def test_two_writers_disjoint_auto_rebase(tmp_path):
    root = str(tmp_path)
    a, log_a = CL.open_log(root)
    b, log_b = CL.open_log(root)

    a.mkdir(ROOT_INODE, "alpha")
    assert log_a.commit(a, writer="a") == 0

    # b still thinks base is -1; its claim of v0 loses, it rebases
    # (picking up /alpha) and lands v1
    b.mkdir(ROOT_INODE, "beta")
    assert log_b.commit(b, writer="b") == 1
    assert b.resolve_path("/alpha")  # rebase pulled in a's commit
    assert b.resolve_path("/beta")

    final, _ = CL.open_log(root)
    assert final.base_version == 1
    names = {final.nodes[i].name for i in final.children[ROOT_INODE].values()}
    assert names == {"alpha", "beta"}


def test_overlapping_paths_conflict(tmp_path):
    root = str(tmp_path)
    a, log_a = CL.open_log(root)
    b, log_b = CL.open_log(root)

    a.add_immutable_bytes(ROOT_INODE, "shared.txt", b"A")
    b.add_immutable_bytes(ROOT_INODE, "shared.txt", b"B")
    assert log_a.commit(a, writer="a") == 0
    with pytest.raises(CL.CommitConflict) as ei:
        log_b.commit(b, writer="b")
    assert "/shared.txt" in ei.value.mine
    assert "/shared.txt" in ei.value.theirs


def test_ancestor_descendant_conflict(tmp_path):
    root = str(tmp_path)
    w, log = CL.open_log(root)
    w.mkdir(ROOT_INODE, "d")
    log.commit(w)

    a, log_a = CL.open_log(root)
    b, log_b = CL.open_log(root)
    a.remove(ROOT_INODE, "d")
    b.add_immutable_bytes(b.resolve_path("/d"), "x", b"x")
    log_a.commit(a, writer="a")
    # b created under the dir a removed: rebase would be wrong, so it
    # must conflict ("/d" vs "/d/x")
    with pytest.raises(CL.CommitConflict):
        log_b.commit(b, writer="b")


def test_rebase_replays_staged_writes(tmp_path):
    root = str(tmp_path)
    a, log_a = CL.open_log(root)
    b, log_b = CL.open_log(root)

    ia = a.create_writable(ROOT_INODE, "a.txt")
    a.write(ia, b"AAAA")
    a.truncate(ia, 3)
    ib = b.create_writable(ROOT_INODE, "b.txt")
    b.write(ib, b"BBBB")

    log_a.commit(a, writer="a")
    log_b.commit(b, writer="b")  # rebases; journal replays create+write

    final, _ = CL.open_log(root)
    assert final.read_path("/a.txt") == b"AAA"
    assert final.read_path("/b.txt") == b"BBBB"


def test_rename_and_remove_journal_replay(tmp_path):
    root = str(tmp_path)
    w, log = CL.open_log(root)
    d = w.mkdir(ROOT_INODE, "dir")
    w.add_immutable_bytes(d, "old", b"v")
    w.add_immutable_bytes(ROOT_INODE, "gone", b"g")
    log.commit(w)

    a, log_a = CL.open_log(root)
    b, log_b = CL.open_log(root)
    a.mkdir(ROOT_INODE, "unrelated")
    log_a.commit(a, writer="a")

    dirnode = b.resolve_path("/dir")
    b.rename(dirnode, "old", dirnode, "new")
    b.remove(ROOT_INODE, "gone")
    log_b.commit(b, writer="b")  # rebase over a's commit, replay ops

    final, _ = CL.open_log(root)
    assert final.read_path("/dir/new") == b"v"
    with pytest.raises(E.NotFoundError):
        final.resolve_path("/dir/old")
    with pytest.raises(E.NotFoundError):
        final.resolve_path("/gone")


def test_many_threads_all_land(tmp_path):
    """8 writer threads x 3 commits each over disjoint subtrees: every
    commit must land (auto-rebase), versions must be contiguous, and
    the final catalog must contain every path."""
    root = str(tmp_path)
    N, K = 8, 3
    errors: list[Exception] = []

    def writer(i: int) -> None:
        try:
            store, log = CL.open_log(root)
            store.mkdir(ROOT_INODE, f"w{i}")
            log.commit(store, writer=f"w{i}")
            for j in range(K - 1):
                parent = store.resolve_path(f"/w{i}")
                store.add_immutable_bytes(parent, f"f{j}", b"x" * (j + 1))
                log.commit(store, writer=f"w{i}")
        except Exception as exc:  # pragma: no cover - fail the test
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(N)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []

    log = CL.CommitLog(root)
    assert log.current_version() == N * K - 1
    # contiguous, parseable records
    for v in range(N * K):
        rec = log.read_record(v)
        assert rec["version"] == v
    final, _ = CL.open_log(root)
    for i in range(N):
        for j in range(K - 1):
            assert final.read_path(f"/w{i}/f{j}") == b"x" * (j + 1)


def _three_versions(root: str) -> None:
    w, log = CL.open_log(root)
    w.mkdir(ROOT_INODE, "v0dir")
    log.commit(w, message="v0")
    w.add_immutable_bytes(ROOT_INODE, "v1file", b"one")
    log.commit(w, message="v1")
    w.remove(ROOT_INODE, "v0dir")
    log.commit(w, message="v2")


def test_time_travel_open(tmp_path):
    root = str(tmp_path)
    _three_versions(root)

    old, _ = CL.open_log(root, version=0)
    assert old.base_version == 0
    assert old.resolve_path("/v0dir")
    with pytest.raises(E.NotFoundError):
        old.resolve_path("/v1file")  # not yet created at v0

    latest, _ = CL.open_log(root)
    assert latest.base_version == 2
    with pytest.raises(E.NotFoundError):
        latest.resolve_path("/v0dir")  # removed at v2

    with pytest.raises(E.NotFoundError):
        CL.open_log(root, version=99)


def test_time_traveled_store_commits_onto_frontier(tmp_path):
    """Open at an old version, mutate a path disjoint from later
    commits → the commit rebases onto the frontier (restore-by-commit),
    preserving the later history."""
    root = str(tmp_path)
    _three_versions(root)
    old, log = CL.open_log(root, version=0)
    old.mkdir(ROOT_INODE, "restored")
    assert log.commit(old, writer="traveler") == 3
    final, _ = CL.open_log(root)
    assert final.resolve_path("/restored")
    assert final.resolve_path("/v1file")  # later history kept


def test_vacuum_keeps_records_drops_old_snapshots(tmp_path):
    root = str(tmp_path)
    _three_versions(root)
    log = CL.CommitLog(root)
    assert log.vacuum(keep_last=1) == [0, 1]
    # records survive for history/conflict checks
    assert [log.read_record(v)["version"] for v in range(3)] == [0, 1, 2]
    # latest still opens; vacuumed versions fail loudly
    latest, _ = CL.open_log(root)
    assert latest.base_version == 2
    with pytest.raises(E.NotFoundError):
        CL.open_log(root, version=1)
    # vacuum is idempotent
    assert log.vacuum(keep_last=1) == []


def test_spark_history_and_snapshot_readers(tmp_path, spark):
    root = str(tmp_path)
    _three_versions(root)
    hist = CL.history_df(spark, root).orderBy("version").collect()
    assert [r["version"] for r in hist] == [0, 1, 2]
    assert hist[2]["touched"] == ["/v0dir"]

    snap0 = CL.snapshot_df(spark, root, version=0)
    assert {r["name"] for r in snap0.collect()} == {"", "v0dir"}
    latest = CL.snapshot_df(spark, root)
    assert {r["name"] for r in latest.collect()} == {"", "v1file"}
    with pytest.raises(E.NotFoundError):
        CL.snapshot_df(spark, root, version=42)


def test_plain_store_refuses_commit(tmp_path):
    """A store that wasn't opened via open_log has no journal — letting
    it commit would silently skip conflict detection and rebase."""
    store = DataStore(str(tmp_path))
    store.mkdir(ROOT_INODE, "x")
    log = CL.CommitLog(str(tmp_path))
    with pytest.raises(E.CatalogError, match="journal"):
        log.commit(store)


def test_commit_record_is_honest_about_footprint(tmp_path):
    root = str(tmp_path)
    store, log = CL.open_log(root)
    d = store.mkdir(ROOT_INODE, "a")
    store.add_immutable_bytes(d, "f", b"1")
    log.commit(store)
    rec = json.loads(open(log.record_path(0)).read())
    assert rec["touched"] == ["/a", "/a/f"]
    assert rec["nodes"] == 3  # root + dir + file
