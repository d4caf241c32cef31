"""Chaos: the three consistency mechanisms raced TOGETHER — O_EXCL
version claims (N writer threads), delta/checkpoint chains (mixed by a
small checkpoint_every), and mirror folds (a continuously-running
streaming query, restarted mid-run) — plus a concurrent reader calling
materialize() against the same log. Each mechanism is tested alone in
test_commitlog / test_datasource; this pins their composition: at the
end of every run the mirror equals materialize(final)."""

import random
import threading
import time

import pytest

# chaos writer/reader fleet soak (~2 min total) — opt-in (see pytest.ini)
pytestmark = pytest.mark.soak

from pufs_spark.catalog import commitlog as CL
from pufs_spark.catalog.datastore import ROOT_INODE
from pufs_spark.streaming import mirror as M

N_WRITERS = 4
COMMITS_PER_WRITER = 5
RUNS = 20


def _writer(root: str, wid: int, errs: list):
    try:
        w, log = CL.open_log(root)
        d = None
        for j in range(COMMITS_PER_WRITER):
            if d is None:
                d = w.mkdir(ROOT_INODE, f"w{wid}")
            else:
                # resolve again: a rebase may have re-allocated inodes
                d = w.resolve_path(f"/w{wid}")
            w.add_immutable_bytes(d, f"f{j}", bytes([wid]) * (j + 1))
            if j == 3:
                w.remove(d, "f1")  # exercise subtree/absent folding
            # small checkpoint_every mixes delta + checkpoint commits
            log.commit(w, writer=f"w{wid}", checkpoint_every=4)
            time.sleep(random.random() * 0.01)
    except Exception as exc:  # noqa: BLE001
        errs.append((wid, exc))


def _reader(root: str, stop: threading.Event, errs: list):
    """Concurrent materialize() calls race the mirror's own rebuilds
    for the cache files."""
    log = CL.CommitLog(root)
    while not stop.is_set():
        v = log.current_version()
        if v >= 0:
            try:
                log.materialize(random.randint(0, v))
            except Exception as exc:  # noqa: BLE001
                errs.append(("reader", exc))
        time.sleep(0.02)


def _expected_map(root: str, version: int) -> dict:
    got, _ = CL.open_log(root, version=version)
    out = {}
    stack = [(ROOT_INODE, "/")]
    while stack:
        inode, path = stack.pop()
        n = got.nodes[inode]
        out[path] = (n.is_dir, n.size, n.bid)
        for name, child in got.children.get(inode, {}).items():
            stack.append((child, (path.rstrip("/") or "") + "/" + name))
    return out


@pytest.mark.parametrize("run", range(RUNS))
def test_chaos_writers_mirror_reader(spark, tmp_path, run):
    root = str(tmp_path / "cat")
    mdir = str(tmp_path / "mirror")
    ckpt = str(tmp_path / "ckpt")
    # seed version 0 so the mirror has something immediately
    w0, log = CL.open_log(root)
    w0.mkdir(ROOT_INODE, "seed")
    log.commit(w0, writer="seed")

    q = M.start_catalog_mirror(spark, root, mdir, ckpt, available_now=False)
    errs: list = []
    stop = threading.Event()
    threads = [
        threading.Thread(target=_writer, args=(root, i, errs))
        for i in range(N_WRITERS)
    ]
    reader = threading.Thread(target=_reader, args=(root, stop, errs))
    reader.start()
    [t.start() for t in threads]
    # chaos on the mirror itself: restart it mid-run on half the runs
    if run % 2 == 0:
        time.sleep(0.3)
        q.stop()
        q.awaitTermination(60)
        q = M.start_catalog_mirror(spark, root, mdir, ckpt, available_now=False)
    [t.join() for t in threads]
    stop.set()
    reader.join()
    assert not errs, errs

    final = CL.CommitLog(root).current_version()
    assert final == N_WRITERS * COMMITS_PER_WRITER  # every commit landed
    deadline = time.time() + 60
    while M.mirror_version(mdir) < final and time.time() < deadline:
        time.sleep(0.1)
    q.stop()
    q.awaitTermination(60)
    assert M.mirror_version(mdir) == final

    mirror = {
        r["path"]: (r["is_dir"], r["size"], r["bid"])
        for r in M.read_mirror(spark, mdir).collect()
    }
    assert mirror == _expected_map(root, final)
