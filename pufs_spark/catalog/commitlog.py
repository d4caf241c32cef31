"""Multi-writer catalog commits: a Delta-style optimistic commit log.

The reference keeps catalog writes in ONE short BoltDB transaction and
revalidates state after any network I/O done outside the lock
(core/datastore.go:666-735) — a single-writer design. At Spark scale
several drivers/jobs may legitimately publish into one catalog, so this
module provides the multi-writer analog sketched in SURVEY §3.1/§7.5:

- every commit is a full catalog snapshot (one parquet file) plus a
  JSON commit record in ``<root>/_commit_log/``, named by a
  monotonically increasing version — the same file layout idea as
  Delta Lake's ``_delta_log`` (public protocol);
- version N is CLAIMED atomically with ``O_CREAT|O_EXCL`` on the
  record file — the filesystem arbitrates racing writers, no locks held
  while snapshots are written;
- a writer that loses the race rebases: it loads the winner's
  snapshot, replays its own path-addressed op journal
  (``DataStore.replay_ops``), and tries the next version — unless its
  touched paths overlap a winner's, in which case ``CommitConflict``
  is raised for the caller to resolve (same rule Delta applies to
  conflicting transactions).

Content blocks need no coordination: the CAS (``sources/cas.Freezer``)
is content-addressed and its writes are temp+rename if-absent, so
concurrent writers landing the same bytes converge on one block.
"""

from __future__ import annotations

import json
import os
import time

from pufs_spark.catalog import errors as E
from pufs_spark.catalog.datastore import DataStore


class CommitConflict(E.CatalogError):
    """Another writer committed an overlapping path first; the loser's
    journal cannot be auto-rebased. Carries both path sets."""

    def __init__(self, mine: set[str], theirs: set[str]):
        self.mine, self.theirs = mine, theirs
        super().__init__(
            f"commit conflict: mine={sorted(mine)} theirs={sorted(theirs)}"
        )


def touched_paths(journal: list[tuple]) -> set[str]:
    """Full paths a journal creates/mutates/destroys — the conflict
    footprint. Parent dirs are NOT included (two writers adding
    different children to one dir must not conflict — that is the
    whole point of multi-writer)."""
    out: set[str] = set()

    def child(parent: str, name: str) -> str:
        return (parent.rstrip("/") or "") + "/" + name

    for op in journal:
        kind = op[0]
        if kind in (
            "mkdir", "create", "add_bytes", "link_remote",
            "remove", "mount_bid", "unmount",
        ):
            out.add(child(op[1], op[2]))
        elif kind in ("write", "truncate"):
            out.add(op[1])
        elif kind == "rename":
            out.add(child(op[1], op[2]))
            out.add(child(op[3], op[4]))
    return out


def paths_overlap(a: set[str], b: set[str]) -> bool:
    """True if any path in one set equals, contains, or is contained by
    a path in the other (removing ``/d`` conflicts with creating
    ``/d/x``, and vice versa)."""
    for p in a:
        for q in b:
            if p == q or p.startswith(q + "/") or q.startswith(p + "/"):
                return True
    return False


class CommitLog:
    """The ``_commit_log/`` directory: versioned snapshots + records."""

    DIRNAME = "_commit_log"

    def __init__(self, root_dir: str, clock=time.time):
        self.dir = os.path.join(root_dir, self.DIRNAME)
        os.makedirs(self.dir, exist_ok=True)
        self.clock = clock

    # -- layout ---------------------------------------------------------

    def record_path(self, version: int) -> str:
        return os.path.join(self.dir, f"{version:012d}.json")

    def snapshot_path(self, version: int) -> str:
        return os.path.join(self.dir, f"{version:012d}.parquet")

    def current_version(self) -> int:
        """Highest CLAIMED version (-1 if the log is empty)."""
        vs = [
            int(f[:12])
            for f in os.listdir(self.dir)
            if f.endswith(".json") and f[:12].isdigit()
        ]
        return max(vs, default=-1)

    def read_record(self, version: int, retries: int = 50) -> dict:
        """A record may exist but still be mid-write (claimed via
        O_EXCL, body written after); poll briefly for the full JSON —
        the window is a few syscalls wide."""
        path = self.record_path(version)
        for _ in range(retries):
            try:
                with open(path) as f:
                    return json.load(f)
            except (json.JSONDecodeError, FileNotFoundError):
                time.sleep(0.01)
        raise E.CatalogError(f"commit record v{version} unreadable")

    def records(self, start: int, end: int) -> list[dict]:
        return [self.read_record(v) for v in range(start, end + 1)]

    def wait_snapshot(self, version: int, retries: int = 200) -> str:
        """Path of ``version``'s snapshot, polling through the
        claim→rename window: ``commit`` claims the record file via
        O_EXCL *before* ``os.replace``-ing the snapshot into place, so
        a reader arriving between the two syscalls sees a claimed
        version with no snapshot yet. Mirror of ``read_record``'s
        poll for the record body.

        Fails fast (no poll) when the version was never claimed, or
        when a NEWER snapshot exists — ``vacuum`` only ever removes
        old snapshots, so a missing-but-older-than-the-frontier
        snapshot is vacuumed, not mid-write. Bounded wait otherwise,
        then ``NotFoundError`` (covers a writer that claimed and
        crashed before the rename)."""
        path = self.snapshot_path(version)
        for _ in range(retries):
            if os.path.exists(path):
                return path
            if not os.path.exists(self.record_path(version)):
                break  # never claimed: nothing to wait for
            newer = any(
                f.endswith(".parquet")
                and f[:12].isdigit()
                and int(f[:12]) > version
                for f in os.listdir(self.dir)
            )
            if newer:
                break  # frontier moved past it: vacuumed, not mid-write
            time.sleep(0.01)
        # Final re-check: between our last exists() and the break
        # condition, the rename (and even a successor commit) may have
        # landed — don't report NotFound for a file that is there now.
        if os.path.exists(path):
            return path
        raise E.NotFoundError(f"version {version} (never committed, or vacuumed)")

    # -- the commit protocol -------------------------------------------

    def try_claim(self, version: int) -> int | None:
        """Atomically claim ``version`` (O_CREAT|O_EXCL on the record
        file). Returns an open fd on success, None if someone else owns
        the version."""
        try:
            return os.open(
                self.record_path(version),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            return None

    def commit(
        self,
        store: DataStore,
        writer: str = "driver",
        message: str = "",
        max_retries: int = 50,
    ) -> int:
        """Commit ``store``'s current state as the next version.

        Optimistic loop: snapshot → claim base+1 → on lost race, check
        the winners' touched paths against ours; disjoint → rebase
        (load winner snapshot, replay our journal) and retry, overlap →
        ``CommitConflict``. On success the store's journal is cleared
        and ``store.base_version`` advances.

        NOTE on rebase: the store object is updated IN PLACE but inode
        numbers may change (each writer allocates its own); hold paths,
        not inodes, across a commit."""
        if not store.journaling:
            raise E.CatalogError(
                "store was not opened for multi-writer commits "
                "(use commitlog.open_log so mutations are journaled)"
            )
        for _ in range(max_retries):
            base = store.base_version
            version = base + 1
            # Snapshot BEFORE claiming, under a private name: once the
            # claim lands the snapshot only needs an atomic rename, so
            # no reader can observe a claimed version whose snapshot is
            # still being written. The record body is written last —
            # read_record treats an empty/partial record as "not yet
            # committed", which transitively guards the snapshot too.
            tmp = self.snapshot_path(version) + f".tmp.{os.getpid()}.{id(store)}"
            journal = list(store._journal)
            store.save(tmp)
            fd = self.try_claim(version)
            if fd is not None:
                try:
                    os.replace(tmp, self.snapshot_path(version))
                    rec = {
                        "version": version,
                        "base_version": base,
                        "writer": writer,
                        "ts": self.clock(),
                        "message": message,
                        "touched": sorted(touched_paths(journal)),
                        "ops": len(journal),
                        "nodes": len(store.nodes),
                    }
                    os.write(fd, json.dumps(rec).encode())
                    os.fsync(fd)
                finally:
                    os.close(fd)
                store.clear_journal()
                store.base_version = version
                return version
            os.unlink(tmp)
            # Lost the race: someone owns base+1 (maybe more). Find the
            # frontier, check for conflicts, rebase our journal on it.
            current = self.current_version()
            mine = touched_paths(store._journal)
            for rec in self.records(base + 1, current):
                theirs = set(rec["touched"])
                if paths_overlap(mine, theirs):
                    raise CommitConflict(mine, theirs)
            self.rebase(store, current)
        raise E.CatalogError(f"commit did not land in {max_retries} tries")

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop snapshot parquets for all but the newest ``keep_last``
        committed versions. Records are never dropped: they are tiny,
        and conflict checks + history queries need the full chain.
        Time-traveling to a vacuumed version then fails loudly
        (NotFoundError) instead of silently reading nothing. Returns
        the versions whose snapshots were removed."""
        current = self.current_version()
        removed: list[int] = []
        for v in range(0, max(current - keep_last + 1, 0)):
            p = self.snapshot_path(v)
            if os.path.exists(p):
                os.unlink(p)
                removed.append(v)
        return removed

    def rebase(self, store: DataStore, version: int) -> None:
        """Reload ``store`` from committed ``version`` and replay its
        journal on top (in place: nodes/children/etc. are swapped)."""
        journal = list(store._journal)
        fresh = DataStore.load(
            store.root_dir,
            remote=store.remote,
            clock=store.clock,
            lister=store.lister,
            catalog_file=self.wait_snapshot(version),
        )
        store.nodes = fresh.nodes
        store.children = fresh.children
        store._next_inode = fresh._next_inode
        store.block_sources.update(fresh.block_sources)
        store.clear_journal()
        store.replay_ops(journal)  # re-journals via the public mutators
        store.base_version = version


def open_log(
    root_dir: str,
    remote=None,
    clock=time.time,
    lister=None,
    version: int | None = None,
) -> tuple[DataStore, CommitLog]:
    """Open (or initialize) a multi-writer catalog at ``root_dir``:
    returns a DataStore positioned at the latest committed version
    (fresh/empty if the log is new) plus the CommitLog to commit
    through.

    ``version`` time-travels to a specific committed version (raises
    ``NotFoundError`` if it was never committed or was vacuumed). A
    time-traveled store can still commit: its journal rebases onto the
    CURRENT frontier like any other writer, so "restore an old
    version's subtree" is just open-at-v, mutate, commit."""
    log = CommitLog(root_dir, clock=clock)
    v = log.current_version() if version is None else version
    if v < 0:
        store = DataStore(root_dir, remote=remote, clock=clock, lister=lister)
    else:
        snap = log.wait_snapshot(v)
        store = DataStore.load(
            root_dir, remote=remote, clock=clock, lister=lister,
            catalog_file=snap,
        )
        store.base_version = v
    store.journaling = True
    return store, log


# ---------------------------------------------------------------------------
# Spark-side readers (the commit log is itself a queryable table)
# ---------------------------------------------------------------------------


# Explicit record schema: skips the inference pass (one less read of
# every record file) and pins the PERMISSIVE-mode behavior history_df
# relies on below.
_RECORD_SCHEMA = (
    "version long, base_version long, writer string, ts double, "
    "message string, touched array<string>, ops long, nodes long"
)


def history_df(spark, root_dir: str):
    """Commit history as a DataFrame (one row per committed version:
    version, base_version, writer, ts, message, touched, ops, nodes) —
    the audit/monitoring surface, like ``DESCRIBE HISTORY`` on a Delta
    table.

    Safe against in-flight commits: a record file is CLAIMED (created
    empty) before its body is written, so a raw directory read can see
    a claimed-but-unwritten file — the same window ``read_record`` /
    ``wait_snapshot`` poll through. With the explicit schema, PERMISSIVE
    mode turns any empty/partial record into an all-null row, and the
    ``version IS NOT NULL`` filter drops it: the frame is simply the
    history as of the moment the in-flight commit had not yet landed
    (every COMPLETE record has a non-null version by construction)."""
    log = CommitLog(root_dir)
    return (
        spark.read.schema(_RECORD_SCHEMA)
        .json(os.path.join(log.dir, "*.json"))
        .where("version IS NOT NULL")
    )


def snapshot_df(spark, root_dir: str, version: int | None = None):
    """A committed catalog version as a DataFrame of node rows — time
    travel for distributed catalog queries (catalog/queries.py
    operators run unchanged over it). Defaults to the latest
    version."""
    log = CommitLog(root_dir)
    v = log.current_version() if version is None else version
    if v < 0:
        raise E.NotFoundError(f"version {v} (never committed, or vacuumed)")
    return spark.read.parquet(log.wait_snapshot(v))
