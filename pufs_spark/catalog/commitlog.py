"""Multi-writer catalog commits: a Delta-style optimistic commit log.

The reference keeps catalog writes in ONE short BoltDB transaction and
revalidates state after any network I/O done outside the lock
(core/datastore.go:666-735) — a single-writer design. At Spark scale
several drivers/jobs may legitimately publish into one catalog, so this
module provides the multi-writer analog sketched in SURVEY §3.1/§7.5:

- every commit is a JSON commit record in ``<root>/_commit_log/``,
  named by a monotonically increasing version — the same file layout
  idea as Delta Lake's ``_delta_log`` (public protocol). Most commits
  are DELTA records (post-commit node state of the touched paths,
  O(change)); every ``checkpoint_every`` versions — or whenever the
  journal can't fully describe the change — a full catalog parquet
  checkpoints the chain (Delta's delta-JSON + checkpoint shape);
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
from dataclasses import asdict, replace

from pufs_spark.catalog import errors as E
from pufs_spark.catalog.datastore import (
    ROOT_INODE,
    DataStore,
    Node,
    RemoteSource,
)


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
        self.root_dir = root_dir
        self.dir = os.path.join(root_dir, self.DIRNAME)
        os.makedirs(self.dir, exist_ok=True)
        self.clock = clock

    # -- layout ---------------------------------------------------------

    def record_path(self, version: int) -> str:
        return os.path.join(self.dir, f"{version:012d}.json")

    def snapshot_path(self, version: int) -> str:
        return os.path.join(self.dir, f"{version:012d}.parquet")

    def cache_path(self, version: int) -> str:
        """A MATERIALIZED delta version (checkpoint + replayed deltas,
        written by ``materialize``). Disposable: re-derivable while the
        base checkpoint lives. The ``cache-`` prefix keeps it invisible
        to ``current_version``/``wait_snapshot``'s digit-prefix
        matching."""
        return os.path.join(self.dir, f"cache-{version:012d}.parquet")

    def export_path(self, version: int) -> str:
        """A cached PATH-STATE export of ``version`` (path/is_dir/size/
        bid rows, written by ``snapshot_changes``). Same lifecycle as
        ``cache_path``: re-derivable while the version is, reclaimed by
        ``vacuum`` below the retention cut."""
        return os.path.join(self.dir, f"cache-export-{version:012d}.parquet")

    def export_state(self, version: int) -> str:
        """Materialize ``version`` and export its path-state parquet
        (atomic temp+rename; repeat callers reuse the cached file, so
        backfill consumers don't accumulate catalog-sized temp dirs)."""
        out = self.export_path(version)
        if os.path.exists(out):
            return out
        store = DataStore.load(
            self.root_dir, catalog_file=self.materialize(version)
        )
        tmp = out + f".tmp.{os.getpid()}.{id(store)}"
        store.export_catalog(tmp, expand=False)
        os.replace(tmp, out)
        return out

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

    # -- incremental (delta) commits -----------------------------------
    #
    # A full catalog parquet per commit is O(catalog size) no matter how
    # small the change — at a 4M-row catalog and a multi-writer commit
    # rate, snapshot writes dominate. Delta commits write only the
    # POST-COMMIT NODE STATE of the touched paths plus their ancestor
    # spines (where dirty-bit propagation lands) into the JSON record,
    # and no parquet at all; every ``checkpoint_every`` versions — or
    # whenever the journal can't fully describe the change — a full
    # checkpoint anchors the chain, exactly Delta Lake's
    # delta-JSON + periodic-checkpoint shape. Reconstruction
    # (``materialize``) loads the newest checkpoint at-or-below the
    # requested version and applies the delta records in order.
    #
    # Fidelity contract: PATH-level (paths, kinds, sizes, mtimes, bids,
    # flags, sources). Inode numbers are writer-local everywhere in this
    # module already ("hold paths, not inodes") — a reconstructed store
    # allocates its own.
    #
    # A delta record is only eligible when the journal fully describes
    # the change:
    #   - no ``rename`` ops (a rename moves a whole subtree: descendant
    #     paths change without appearing in the touched set);
    #   - no un-journaled catalog mutation since base (freeze results,
    #     lazy child materialization — ``store._unjournaled_mutation``);
    # otherwise commit falls back to a full checkpoint.

    _DELTA_FIELDS = (
        "is_dir", "size", "mtime", "is_dirty", "bid", "deferred", "local_path"
    )

    @staticmethod
    def _delta_eligible(store: DataStore, journal: list[tuple]) -> bool:
        return (
            bool(journal)
            and not store._unjournaled_mutation
            and not any(op[0] == "rename" for op in journal)
        )

    @staticmethod
    def _spine_closure(paths: set[str]) -> list[str]:
        """``paths`` plus every ancestor prefix (including the root),
        shallowest first — parents before children for apply."""
        full: set[str] = set()
        for p in paths:
            parts = [c for c in p.split("/") if c]
            for i in range(len(parts) + 1):
                full.add("/" + "/".join(parts[:i]))
        return sorted(full, key=lambda x: (len(x.split("/")), x))

    def _delta_payload(self, store: DataStore, journal: list[tuple]) -> dict:
        """Post-commit node state for the touched closure: upserts for
        paths that resolve, absents for paths that no longer do."""
        upserts, absent = [], []
        for p in self._spine_closure(touched_paths(journal)):
            try:
                inode = store.resolve_path(p)
            except E.CatalogError:
                if p != "/":
                    absent.append(p)
                continue
            n = store.nodes[inode]
            row = {"path": p, "name": n.name}
            for f in self._DELTA_FIELDS:
                row[f] = getattr(n, f)
            row["src"] = asdict(n.remote_source) if n.remote_source else None
            upserts.append(row)
        return {"upserts": upserts, "absent": absent}

    @staticmethod
    def _apply_delta(store: DataStore, delta: dict) -> None:
        """Apply one delta record to ``store`` (a reconstruction store:
        journaling off, no remote). Upserts land parents-first (the
        payload is spine-closed and pre-sorted); absents remove whole
        subtrees (covers unmount of an expanded mount)."""
        for u in delta["upserts"]:
            src = RemoteSource(**u["src"]) if u["src"] else None
            if u["path"] == "/":
                root = store.nodes[ROOT_INODE]
                store.nodes[ROOT_INODE] = replace(
                    root,
                    size=u["size"], mtime=u["mtime"],
                    is_dirty=u["is_dirty"], bid=u["bid"],
                    deferred=u["deferred"],
                )
                continue
            parent_path, _, name = u["path"].rpartition("/")
            parent = store.resolve_path(parent_path or "/")
            existing = store.children.get(parent, {}).get(name)
            if existing is not None and store.nodes[existing].is_dir != u["is_dir"]:
                # same name, different kind: the journal removed one and
                # created the other — drop the stale subtree first
                store._remove_recursive(parent, name, existing)
                existing = None
            if existing is not None:
                store.nodes[existing] = replace(
                    store.nodes[existing],
                    size=u["size"], mtime=u["mtime"],
                    is_dirty=u["is_dirty"], bid=u["bid"],
                    deferred=u["deferred"], local_path=u["local_path"],
                    remote_source=src,
                )
            else:
                store._insert(
                    Node(
                        inode=store._alloc_inode(),
                        parent=parent,
                        name=name,
                        is_dir=u["is_dir"],
                        size=u["size"],
                        mtime=u["mtime"],
                        is_dirty=u["is_dirty"],
                        bid=u["bid"],
                        deferred=u["deferred"],
                        local_path=u["local_path"],
                        remote_source=src,
                    ),
                    mark_dirty=False,
                )
            if src is not None and not u["is_dir"] and u["bid"]:
                store.block_sources[u["bid"]] = src
        for p in sorted(delta["absent"], key=lambda x: -len(x.split("/"))):
            try:
                inode = store.resolve_path(p)
            except E.CatalogError:
                continue
            parent_path, _, name = p.rpartition("/")
            parent = store.resolve_path(parent_path or "/")
            store._remove_recursive(parent, name, inode)

    def materialize(self, version: int) -> str:
        """Path of a parquet holding ``version``'s full catalog,
        reconstructing through delta records when the version has no
        snapshot of its own: walk back to the nearest checkpoint (or
        cached materialization), apply the intervening deltas oldest
        first, cache the result (atomic temp+rename — concurrent
        materializers converge). Raises ``NotFoundError`` for
        never-committed versions and for delta chains whose base
        checkpoint was vacuumed."""
        snap = self.snapshot_path(version)
        if os.path.exists(snap):
            return snap
        cache = self.cache_path(version)
        if os.path.exists(cache):
            return cache
        if not os.path.exists(self.record_path(version)):
            raise E.NotFoundError(f"version {version} (never committed, or vacuumed)")
        deltas: list[dict] = []
        v = version
        while True:
            rec = self.read_record(v)
            if "delta" not in rec:
                # full-snapshot version: present (maybe mid-write) or
                # vacuumed — wait_snapshot distinguishes and raises.
                base = self.wait_snapshot(v)
                break
            deltas.append(rec["delta"])
            v -= 1
            if v < 0:
                raise E.CatalogError(
                    f"delta chain below version {version} has no checkpoint"
                )
            if os.path.exists(self.snapshot_path(v)):
                base = self.snapshot_path(v)
                break
            if os.path.exists(self.cache_path(v)):
                base = self.cache_path(v)
                break
        store = DataStore.load(self.root_dir, catalog_file=base)
        for delta in reversed(deltas):
            self._apply_delta(store, delta)
        tmp = cache + f".tmp.{os.getpid()}.{id(store)}"
        store.save(tmp)
        os.replace(tmp, cache)
        return cache

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
        checkpoint_every: int = 16,
    ) -> int:
        """Commit ``store``'s current state as the next version.

        Optimistic loop: snapshot/delta → claim base+1 → on lost race,
        check the winners' touched paths against ours; disjoint →
        rebase (load winner snapshot, replay our journal) and retry,
        overlap → ``CommitConflict``. On success the store's journal is
        cleared and ``store.base_version`` advances.

        Every ``checkpoint_every``-th version (and whenever the journal
        can't fully describe the change — renames, freeze results, lazy
        expansion) writes a full catalog parquet; other commits write a
        DELTA record only (touched-paths node state inside the JSON),
        making commit cost O(change), not O(catalog).
        ``checkpoint_every=1`` restores full snapshots everywhere.

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
            journal = list(store._journal)
            delta: dict | None = None
            if (
                checkpoint_every > 1
                and version % checkpoint_every != 0
                and self._delta_eligible(store, journal)
            ):
                delta = self._delta_payload(store, journal)
            tmp = None
            if delta is None:
                # Snapshot BEFORE claiming, under a private name: once
                # the claim lands the snapshot only needs an atomic
                # rename, so no reader can observe a claimed version
                # whose snapshot is still being written. The record body
                # is written last — read_record treats an empty/partial
                # record as "not yet committed", which transitively
                # guards the snapshot too.
                tmp = self.snapshot_path(version) + f".tmp.{os.getpid()}.{id(store)}"
                store.save(tmp)
            fd = self.try_claim(version)
            if fd is not None:
                try:
                    if tmp is not None:
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
                        "kind": "checkpoint" if delta is None else "delta",
                    }
                    if delta is not None:
                        rec["delta"] = delta
                    os.write(fd, json.dumps(rec).encode())
                    os.fsync(fd)
                finally:
                    os.close(fd)
                store.clear_journal()
                store._unjournaled_mutation = False
                store.base_version = version
                return version
            if tmp is not None:
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
        """Drop snapshot parquets (and materialization caches) below
        the newest ``keep_last`` committed versions. Records are never
        dropped: they are tiny, and conflict checks + history queries
        need the full chain. Time-traveling to a vacuumed version then
        fails loudly (NotFoundError) instead of silently reading
        nothing. Returns the versions whose snapshots were removed.

        Delta-aware: a retained delta version needs its base checkpoint
        to stay materializable, so the newest checkpoint at-or-below
        the retention cut — and every checkpoint after it — is
        protected even when older than the cut. Caches below the cut
        are always removable (re-derivable while their base lives;
        gone-for-good only when their chain is too, which is exactly
        the vacuumed contract)."""
        current = self.current_version()
        cut = max(current - keep_last + 1, 0)
        ckpts = sorted(
            int(f[:12])
            for f in os.listdir(self.dir)
            if f.endswith(".parquet") and f[:12].isdigit()
        )
        base_needed = max((c for c in ckpts if c <= cut), default=None)
        removed: list[int] = []

        def _unlink(path: str) -> bool:
            # Two concurrent vacuums race each other to every unlink;
            # losing the race just means the other vacuum did the work.
            try:
                os.unlink(path)
                return True
            except FileNotFoundError:
                return False

        for c in ckpts:
            if base_needed is not None and c < base_needed:
                if _unlink(self.snapshot_path(c)):
                    removed.append(c)
        for v in range(0, cut):
            for p in (self.cache_path(v), self.export_path(v)):
                if os.path.exists(p) and _unlink(p) and v not in removed:
                    removed.append(v)
        return sorted(removed)

    def rebase(self, store: DataStore, version: int) -> None:
        """Reload ``store`` from committed ``version`` and replay its
        journal on top (in place: nodes/children/etc. are swapped)."""
        journal = list(store._journal)
        fresh = DataStore.load(
            store.root_dir,
            remote=store.remote,
            clock=store.clock,
            lister=store.lister,
            catalog_file=self.materialize(version),
        )
        store.nodes = fresh.nodes
        store.children = fresh.children
        store._next_inode = fresh._next_inode
        store.block_sources.update(fresh.block_sources)
        store.clear_journal()
        store._unjournaled_mutation = False
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
        snap = log.materialize(v)
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
    "message string, touched array<string>, ops long, nodes long, "
    "kind string"
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


def snapshot_changes(spark, root_dir: str, v_from: int, v_to: int):
    """Per-path changes between two committed versions: (path, change,
    is_dir, size) with change in {'added', 'removed', 'changed'} —
    the BACKFILL companion to the `pufs_commits` CDC stream, which
    emits only a marker row at checkpoint commits; a consumer needing
    row-level diffs across that gap asks this instead.

    Driver cost: two ``materialize()`` + path exports (exactly the
    checkpoint-rebuild cost profile) — but both are CACHED under the
    log's ``cache-`` namespace (``CommitLog.export_state``), so repeat
    consumers (CDC backfill, the H2 harness) reuse them instead of
    leaking a catalog-sized temp dir per call, and ``vacuum`` reclaims
    them with the other caches. The compare itself is a Spark
    full-outer join on path, so the diff classification scales out.
    'changed' means kind, size, or content (bid) differ; unchanged
    paths are not emitted."""
    log = CommitLog(root_dir)
    frames = [
        spark.read.parquet(log.export_state(v)).select(
            "path", "is_dir", "size", "bid"
        )
        for v in (v_from, v_to)
    ]
    from pyspark.sql import functions as F

    a = frames[0].alias("a")
    b = frames[1].alias("b")
    j = a.join(b, F.col("a.path") == F.col("b.path"), "full_outer")
    change = (
        F.when(F.col("a.path").isNull(), F.lit("added"))
        .when(F.col("b.path").isNull(), F.lit("removed"))
        .when(
            (F.col("a.is_dir") != F.col("b.is_dir"))
            | (F.col("a.size") != F.col("b.size"))
            | ~F.col("a.bid").eqNullSafe(F.col("b.bid")),
            F.lit("changed"),
        )
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(
            F.coalesce(F.col("b.path"), F.col("a.path")).alias("path"),
            F.col("change"),
            F.coalesce(F.col("b.is_dir"), F.col("a.is_dir")).alias("is_dir"),
            F.coalesce(F.col("b.size"), F.col("a.size")).alias("size"),
        )
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
    return spark.read.parquet(log.materialize(v))
