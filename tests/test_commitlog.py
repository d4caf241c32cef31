"""Multi-writer catalog commits (catalog/commitlog.py).

The reference is single-writer by construction (one BoltDB tx,
core/datastore.go:666-735); these tests check the multi-writer analog:
optimistic version claims, journal rebase onto a winner's snapshot,
and loud conflicts on overlapping paths.
"""

import json
import os
import threading
import time

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


def test_open_log_waits_through_claim_rename_window(tmp_path):
    """Deterministic replay of the claim→rename race: v0 committed,
    then v1 CLAIMED (record file created via O_EXCL) while its snapshot
    rename is delayed. A reader opening "latest" during the window sees
    current_version()==1 with no snapshot — it must wait for the rename,
    not raise NotFoundError."""
    root = str(tmp_path)
    w, log = CL.open_log(root)
    w.mkdir(ROOT_INODE, "base")
    log.commit(w, message="v0")

    # Freeze mid-commit: claim v1 exactly as commit() does, snapshot
    # prepared under the tmp name but not yet renamed into place.
    w.mkdir(ROOT_INODE, "pending")
    tmp = log.snapshot_path(1) + ".tmp.test"
    w.save(tmp)
    fd = log.try_claim(1)
    assert fd is not None

    def finish():
        time.sleep(0.15)  # hold the window open past a few poll ticks
        os.replace(tmp, log.snapshot_path(1))
        rec = {
            "version": 1, "base_version": 0, "writer": "slow", "ts": 0.0,
            "message": "", "touched": ["/pending"], "ops": 1,
            "nodes": len(w.nodes),
        }
        os.write(fd, json.dumps(rec).encode())
        os.close(fd)

    t = threading.Thread(target=finish)
    t.start()
    try:
        reader, rlog = CL.open_log(root)  # arrives inside the window
    finally:
        t.join()
    assert reader.base_version == 1
    assert reader.resolve_path("/pending")


def test_wait_snapshot_fails_fast_when_never_claimed(tmp_path):
    root = str(tmp_path)
    _three_versions(root)
    log = CL.CommitLog(root)
    t0 = time.monotonic()
    with pytest.raises(E.NotFoundError):
        log.wait_snapshot(99)
    assert time.monotonic() - t0 < 0.5  # no pointless 2s poll


def _three_versions(root: str, checkpoint_every: int = 16) -> None:
    w, log = CL.open_log(root)
    w.mkdir(ROOT_INODE, "v0dir")
    log.commit(w, message="v0", checkpoint_every=checkpoint_every)
    w.add_immutable_bytes(ROOT_INODE, "v1file", b"one")
    log.commit(w, message="v1", checkpoint_every=checkpoint_every)
    w.remove(ROOT_INODE, "v0dir")
    log.commit(w, message="v2", checkpoint_every=checkpoint_every)


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
    # checkpoint_every=1: full snapshots everywhere, the mode whose
    # vacuum semantics this test pins (delta-chain vacuum below)
    root = str(tmp_path)
    _three_versions(root, checkpoint_every=1)
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


def test_vacuumed_versions_fail_loudly_in_spark_readers(tmp_path, spark):
    """Vacuum must be honored by the Spark-side readers too: reading a
    vacuumed version through snapshot_df raises NotFoundError (fast, no
    poll — a newer snapshot proves it's vacuumed, not mid-write), while
    history_df still serves the full record chain."""
    root = str(tmp_path)
    _three_versions(root, checkpoint_every=1)
    assert CL.CommitLog(root).vacuum(keep_last=1) == [0, 1]

    hist = CL.history_df(spark, root)
    assert hist.count() == 3  # records survive vacuum

    t0 = time.monotonic()
    with pytest.raises(E.NotFoundError):
        CL.snapshot_df(spark, root, version=0)
    assert time.monotonic() - t0 < 1.0  # vacuumed → fast fail, no poll
    assert CL.snapshot_df(spark, root).count() > 0  # latest unaffected


def test_history_df_excludes_mid_write_records(tmp_path, spark):
    """Deterministic coverage of the claim→body window: a record file
    that is claimed-but-empty, and one with a truncated JSON body, must
    never surface as corrupt/null rows — history_df reports the history
    as of 'that commit has not landed yet'."""
    root = str(tmp_path)
    store, log = CL.open_log(root)
    store.mkdir(ROOT_INODE, "seed")
    assert log.commit(store, writer="w0") == 0

    # claimed but body not yet written (exactly what try_claim creates)
    fd = log.try_claim(1)
    assert fd is not None
    os.close(fd)
    # claimed with a partial body (writer died mid-os.write)
    with open(log.record_path(2), "w") as f:
        f.write('{"version": 2, "wr')

    rows = CL.history_df(spark, root).collect()
    assert [r["version"] for r in rows] == [0]
    assert all(r["writer"] == "w0" for r in rows)


@pytest.mark.soak  # multi-minute; see pytest.ini
def test_history_df_never_corrupt_under_concurrent_commits(tmp_path, spark):
    """A thread committing in a loop while history_df reads: no read
    may ever yield a null/corrupt row (the raw directory listing can
    see claimed-but-unwritten record files; the schema+filter must hide
    them)."""
    root = str(tmp_path)
    store, log = CL.open_log(root)
    store.mkdir(ROOT_INODE, "seed")
    log.commit(store, writer="w0")

    stop = threading.Event()
    errs: list[Exception] = []

    def committer():
        # Bounded: delta commits are ~1000/s, and an unbounded flood
        # makes each history_df read (one task per record file) slower
        # than the next flood round — the race window is fully
        # exercised within the first few hundred records.
        try:
            for i in range(300):
                if stop.is_set():
                    break
                store.mkdir(ROOT_INODE, f"d{i}")
                log.commit(store, writer="w1")
        except Exception as exc:  # noqa: BLE001 — surfaced below
            errs.append(exc)

    t = threading.Thread(target=committer)
    t.start()
    try:
        for _ in range(20):
            rows = CL.history_df(spark, root).collect()
            assert rows, "history must never read empty once v0 landed"
            for r in rows:
                assert r["version"] is not None
                assert r["writer"] is not None
                assert r["ops"] is not None
    finally:
        stop.set()
        t.join()
    assert not errs


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


# ---------------------------------------------------------------------------
# Incremental (delta) commits
# ---------------------------------------------------------------------------


def _catalog_map(store) -> dict:
    """path → full node state (minus writer-local inode numbers) — the
    fidelity contract a reconstructed version must meet."""
    out = {}
    stack = [(ROOT_INODE, "/")]
    while stack:
        inode, path = stack.pop()
        n = store.nodes[inode]
        out[path] = (
            n.is_dir, n.size, n.mtime, n.is_dirty, n.bid, n.deferred,
            n.local_path, n.remote_source,
        )
        for name, child in store.children.get(inode, {}).items():
            stack.append((child, (path.rstrip("/") or "") + "/" + name))
    return out


def test_delta_reconstruction_matches_writer_state_at_every_version(tmp_path):
    """checkpoint_every=4 over a mixed op sequence (nested mkdir, adds,
    remove, kind change dir→file, remote link, writable create+write):
    opening EVERY version reconstructs exactly the writer's post-commit
    state at path level — including mtimes and dirty bits (recorded
    state, not replay drift)."""
    from pufs_spark.catalog.datastore import RemoteSource

    root = str(tmp_path)
    w, log = CL.open_log(root)
    expected = {}

    def commit(msg):
        v = log.commit(w, message=msg, checkpoint_every=4)
        expected[v] = _catalog_map(w)
        return v

    d = w.mkdir(ROOT_INODE, "a")
    w.mkdir(d, "b")
    commit("v0: nested dirs")                      # checkpoint (v0)
    w.add_immutable_bytes(d, "f1", b"one")
    w.add_immutable_bytes(ROOT_INODE, "top", b"t")
    commit("v1: adds")                             # delta
    w.remove(d, "f1")
    commit("v2: remove")                           # delta
    w.remove(w.resolve_path("/a"), "b")
    w.add_immutable_bytes(d, "b", b"now a file")   # dir → file, same name
    commit("v3: kind change")                      # delta
    w.link_remote(
        ROOT_INODE, "ext",
        RemoteSource(kind="url", url="http://x/e", etag="E", size=3),
        is_dir=False,
    )
    commit("v4: remote link")                      # checkpoint (4 % 4 == 0)
    f = w.create_writable(d, "w1")
    w.write(f, b"staged bytes")
    commit("v5: writable")                         # delta

    for v, want in expected.items():
        got, _ = CL.open_log(root, version=v)
        assert _catalog_map(got) == want, f"version {v} mismatch"
    # content round-trips through the reconstruction too
    latest, _ = CL.open_log(root)
    assert latest.read_path("/a/b") == b"now a file"
    assert latest.read_path("/a/w1") == b"staged bytes"


def test_delta_commits_write_no_parquet_and_record_kind(tmp_path):
    root = str(tmp_path)
    w, log = CL.open_log(root)
    w.mkdir(ROOT_INODE, "d0")
    log.commit(w)                                  # v0: checkpoint
    w.mkdir(ROOT_INODE, "d1")
    log.commit(w)                                  # v1: delta
    assert os.path.exists(log.snapshot_path(0))
    assert not os.path.exists(log.snapshot_path(1))
    assert log.read_record(0)["kind"] == "checkpoint"
    rec1 = log.read_record(1)
    assert rec1["kind"] == "delta"
    # O(change): the delta carries only the touched path + its spine
    assert {u["path"] for u in rec1["delta"]["upserts"]} == {"/", "/d1"}


@pytest.mark.parametrize("trigger", ["rename", "freeze", "lazy"])
def test_journal_gaps_force_a_checkpoint(tmp_path, trigger):
    """Changes the journal can't fully describe — renames (subtree
    paths move), freeze results, lazy child materialization — must fall
    back to a full snapshot, never a delta that silently drops rows."""
    from pufs_spark.sources.remote import MemRemote

    root = str(tmp_path)
    remote = MemRemote()
    w, log = CL.open_log(root, remote=remote)
    d = w.mkdir(ROOT_INODE, "dir")
    w.add_immutable_bytes(d, "f", b"x")
    log.commit(w)                                  # v0 checkpoint
    if trigger == "rename":
        w.rename(ROOT_INODE, "dir", ROOT_INODE, "dir2")
    elif trigger == "freeze":
        w.mkdir(ROOT_INODE, "extra")
        w.freeze()
    else:  # lazy: publish, mount, then expand the mount via a read
        w.push("lbl")
        w.mount_bid(ROOT_INODE, "mnt", remote.get_root("lbl"))
        w.resolve_path("/mnt/dir/f")               # expands /mnt lazily
    v = log.commit(w)
    assert log.read_record(v)["kind"] == "checkpoint"
    assert os.path.exists(log.snapshot_path(v))
    # and the committed state reads back whole
    fresh, _ = CL.open_log(root, remote=remote)
    if trigger == "rename":
        assert fresh.read_path("/dir2/f") == b"x"
    else:
        assert fresh.read_path("/dir/f") == b"x"


def test_vacuum_protects_the_checkpoint_retained_deltas_need(tmp_path):
    root = str(tmp_path)
    w, log = CL.open_log(root)
    for i in range(6):                             # ckpts at 0 and 4
        w.mkdir(ROOT_INODE, f"d{i}")
        log.commit(w, checkpoint_every=4)
    assert os.path.exists(log.snapshot_path(0))
    assert os.path.exists(log.snapshot_path(4))
    log.materialize(3)                             # warm a cache below the cut
    removed = log.vacuum(keep_last=1)              # cut=5: protect ckpt 4
    assert 0 in removed and 4 not in removed
    assert not os.path.exists(log.snapshot_path(0))
    # frontier chain intact: v5 (delta on ckpt 4) and v4 materialize
    assert CL.open_log(root, version=5)[0].resolve_path("/d5")
    assert CL.open_log(root, version=4)[0].resolve_path("/d4")
    # versions whose chain lost its base fail loudly and fast
    t0 = time.monotonic()
    with pytest.raises(E.NotFoundError):
        log.materialize(2)
    assert time.monotonic() - t0 < 1.0


def test_concurrent_delta_writers_disjoint_paths_all_land(tmp_path):
    """8 threads × 5 delta commits each on disjoint paths: every commit
    lands (auto-rebase), the final materialized catalog holds all 40
    files, and no thread errors."""
    root = str(tmp_path)
    seed, log0 = CL.open_log(root)
    seed.mkdir(ROOT_INODE, "seed")
    log0.commit(seed)
    errs: list[Exception] = []

    def writer(k: int):
        try:
            w, log = CL.open_log(root)
            d = w.mkdir(ROOT_INODE, f"w{k}")
            log.commit(w, writer=f"w{k}")
            for i in range(4):
                w.add_immutable_bytes(
                    w.resolve_path(f"/w{k}"), f"f{i}", f"{k}:{i}".encode()
                )
                log.commit(w, writer=f"w{k}")
        except Exception as exc:  # noqa: BLE001 — surfaced below
            errs.append(exc)

    threads = [threading.Thread(target=writer, args=(k,)) for k in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    final, log = CL.open_log(root)
    assert final.base_version == 8 * 5  # seed + 40 commits
    for k in range(8):
        for i in range(4):
            assert final.read_path(f"/w{k}/f{i}") == f"{k}:{i}".encode()


from hypothesis import given, settings
from hypothesis import strategies as st

_DIRS = ["d0", "d1", "d2"]
_FILES = ["f0", "f1", "f2", "f3"]

_OP = st.one_of(
    st.tuples(st.just("mkdir"), st.sampled_from(_DIRS)),
    st.tuples(
        st.just("add"),
        st.sampled_from(["/"] + ["/" + d for d in _DIRS]),
        st.sampled_from(_FILES),
        st.binary(min_size=0, max_size=16),
    ),
    st.tuples(
        st.just("remove"),
        st.sampled_from(["/" + d for d in _DIRS]
                        + [f"/{d}/{f}" for d in _DIRS for f in _FILES]
                        + ["/" + f for f in _FILES]),
    ),
    st.tuples(st.just("commit")),
)


@settings(max_examples=20, deadline=None)
@given(ops=st.lists(_OP, min_size=1, max_size=40))
def test_delta_reconstruction_randomized(tmp_path_factory, ops):
    """Property version of the fixed-sequence delta test: ANY valid
    op sequence (mkdirs, adds, removes, interleaved commits) under
    checkpoint_every=3 reconstructs, at EVERY version, exactly the
    writer's post-commit path-level state."""
    root = str(tmp_path_factory.mktemp("dlog"))
    w, log = CL.open_log(root)
    expected = {}

    def try_commit():
        if not w._journal:
            return
        v = log.commit(w, checkpoint_every=3)
        expected[v] = _catalog_map(w)

    for op in ops:
        try:
            if op[0] == "mkdir":
                w.mkdir(ROOT_INODE, op[1])
            elif op[0] == "add":
                w.add_immutable_bytes(w.resolve_path(op[1]), op[2], op[3])
            elif op[0] == "remove":
                parent, _, name = op[1].rpartition("/")
                w.remove(w.resolve_path(parent or "/"), name)
            else:
                try_commit()
        except E.CatalogError:
            pass  # invalid op against current state: skip, like a user would
    try_commit()

    for v, want in expected.items():
        got, _ = CL.open_log(root, version=v)
        assert _catalog_map(got) == want, f"version {v} mismatch"


def test_unmount_through_delta_removes_expanded_subtree(tmp_path):
    """A mount's lazy EXPANSION forces a checkpoint (unjournaled
    mutation), but a later unmount-only commit is delta-eligible — its
    single 'absent' row must remove the whole expanded subtree on
    reconstruction (recursive apply), not just unlink the mount point."""
    from pufs_spark.sources.remote import MemRemote

    remote = MemRemote()
    pub = DataStore(str(tmp_path / "pub"), remote=remote)
    d = pub.mkdir(ROOT_INODE, "data")
    pub.add_immutable_bytes(d, "f", b"x")
    pub.push("lbl")

    root = str(tmp_path / "cat")
    w, log = CL.open_log(root, remote=remote)
    w.mount_bid(ROOT_INODE, "mnt", remote.get_root("lbl"))
    log.commit(w)
    w.resolve_path("/mnt/data/f")                  # expand lazily
    w.mkdir(ROOT_INODE, "x1")
    v1 = log.commit(w)
    assert log.read_record(v1)["kind"] == "checkpoint"  # expansion forced
    w.unmount(ROOT_INODE, "mnt")
    v2 = log.commit(w)
    assert log.read_record(v2)["kind"] == "delta"

    got, _ = CL.open_log(root, version=v2, remote=remote)
    with pytest.raises(E.NotFoundError):
        got.resolve_path("/mnt")
    names = {n.name for n in got.nodes.values()}
    assert "data" not in names and "f" not in names  # subtree truly gone


def test_snapshot_changes_classifies_all_kinds(tmp_path, spark):
    """added / removed / changed (content and kind changes) between two
    delta-committed versions, exercised through materialize()."""
    root = str(tmp_path)
    w, log = CL.open_log(root)
    d = w.mkdir(ROOT_INODE, "d")
    w.add_immutable_bytes(d, "keep", b"same")
    w.add_immutable_bytes(d, "gone", b"bye")
    w.add_immutable_bytes(d, "grow", b"v1")
    v0 = log.commit(w)
    w.remove(d, "gone")
    w.remove(d, "grow")
    w.add_immutable_bytes(d, "grow", b"longer!")     # content+size change
    w.add_immutable_bytes(d, "new", b"hi")
    v1 = log.commit(w)

    ch = {
        r["path"]: (r["change"], r["is_dir"], r["size"])
        for r in CL.snapshot_changes(spark, root, v0, v1).collect()
    }
    assert ch["/d/new"] == ("added", False, 2)
    assert ch["/d/gone"] == ("removed", False, 3)
    assert ch["/d/grow"] == ("changed", False, 7)
    assert "/d/keep" not in ch                       # unchanged: not emitted
    assert "/d" not in ch  # dir kind/size/bid identical (never frozen)


def test_concurrent_materialize_converges(tmp_path):
    """N threads materializing the same delta version race on the
    cache's temp+rename: all must return a readable path with
    identical content, and the cache ends up written exactly once."""
    root = str(tmp_path)
    w, log = CL.open_log(root)
    for i in range(5):
        w.mkdir(ROOT_INODE, f"d{i}")
        log.commit(w, checkpoint_every=16)          # v1..v4 are deltas
    results: list = []
    errs: list[Exception] = []

    def worker():
        try:
            lg = CL.CommitLog(root)
            p = lg.materialize(4)
            got, _ = CL.open_log(root, version=4)
            results.append(
                (p, tuple(sorted(n.name for n in got.nodes.values())))
            )
        except Exception as exc:  # noqa: BLE001 — surfaced below
            errs.append(exc)

    threads = [threading.Thread(target=worker) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert len({r[1] for r in results}) == 1        # identical content
    assert all(os.path.exists(r[0]) for r in results)
    cache_files = [
        f for f in os.listdir(CL.CommitLog(root).dir) if f.startswith("cache-")
    ]
    assert cache_files == ["cache-000000000004.parquet"]


def test_concurrent_vacuums_race_cleanly(tmp_path):
    """Two vacuums racing each other must both succeed: losing an
    unlink race means the other vacuum did the work, not a crash."""
    w, log = CL.open_log(str(tmp_path))
    d = w.mkdir(ROOT_INODE, "data")
    for i in range(6):
        w.add_immutable_bytes(d, f"f{i}", b"x" * (i + 1))
        log.commit(w, checkpoint_every=1)           # all checkpoints
    errs: list[Exception] = []

    def run():
        try:
            log.vacuum(keep_last=1)
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    ts = [threading.Thread(target=run) for _ in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    # retention contract still holds
    assert os.path.exists(log.snapshot_path(log.current_version()))
    assert not os.path.exists(log.snapshot_path(0))


def test_snapshot_changes_caches_exports(tmp_path, spark):
    """Repeat snapshot_changes calls reuse cached path-state exports
    under the log's cache- namespace (no per-call temp-dir leak), and
    vacuum reclaims them below the retention cut."""
    root = str(tmp_path)
    w, log = CL.open_log(root)
    d = w.mkdir(ROOT_INODE, "data")
    log.commit(w, checkpoint_every=1)               # v0
    w.add_immutable_bytes(d, "f1", b"one")
    log.commit(w, checkpoint_every=1)               # v1

    a = {tuple(r) for r in CL.snapshot_changes(spark, root, 0, 1).collect()}
    assert os.path.exists(log.export_path(0))
    assert os.path.exists(log.export_path(1))
    mtimes = (
        os.path.getmtime(log.export_path(0)),
        os.path.getmtime(log.export_path(1)),
    )
    b = {tuple(r) for r in CL.snapshot_changes(spark, root, 0, 1).collect()}
    assert a == b
    assert mtimes == (
        os.path.getmtime(log.export_path(0)),
        os.path.getmtime(log.export_path(1)),
    ), "second call re-exported instead of reusing the cache"
    # vacuum reclaims exports below the cut alongside the other caches
    w.add_immutable_bytes(d, "f2", b"two")
    log.commit(w, checkpoint_every=1)               # v2
    log.vacuum(keep_last=1)
    assert not os.path.exists(log.export_path(0))
    assert not os.path.exists(log.export_path(1))
