"""Property-based model-vs-implementation testing of the DataStore —
the Hypothesis resurrection of the reference's op-script fuzz DSL
(core/fuzz_entry.go:10-131: d/u/w/r/l/f/p/m statements; gated off as
broken_test upstream, alive here).

Model: a plain dict of path → bytes (None = dir). Every rule applies
the op to both sides and compares outcomes, including expected errors.
Invariants: listings match the model everywhere; freeze is idempotent;
a push → mount round trip on a FRESH store reproduces every byte."""

from __future__ import annotations

import tempfile

from hypothesis import settings
from hypothesis import strategies as st
from hypothesis.stateful import (
    RuleBasedStateMachine,
    invariant,
    precondition,
    rule,
)

from pufs_spark.catalog import errors as E
from pufs_spark.catalog.datastore import ROOT_INODE, DataStore
from pufs_spark.sources.remote import MemRemote

NAMES = st.sampled_from(["a", "b", "c", "dd", "e.txt", "f_1", "G 2"])
PAYLOADS = st.binary(min_size=0, max_size=64)


class FSMachine(RuleBasedStateMachine):
    def __init__(self):
        super().__init__()
        self.tmp = tempfile.TemporaryDirectory()
        self.remote = MemRemote()
        self.ds = DataStore(self.tmp.name + "/store", remote=self.remote)
        self.model: dict[str, bytes | None] = {"/": None}
        self.push_count = 0

    def teardown(self):
        self.tmp.cleanup()

    # -- helpers -------------------------------------------------------

    def _dirs(self) -> list[str]:
        return sorted(p for p, v in self.model.items() if v is None)

    def _files(self) -> list[str]:
        return sorted(p for p, v in self.model.items() if v is not None)

    def _join(self, d: str, name: str) -> str:
        return (d if d != "/" else "") + "/" + name

    def _children(self, d: str) -> set[str]:
        prefix = (d if d != "/" else "") + "/"
        return {
            p[len(prefix) :]
            for p in self.model
            if p != "/" and p.startswith(prefix) and "/" not in p[len(prefix) :]
        }

    def _inode(self, path: str) -> int:
        return self.ds.resolve_path(path)

    # -- rules ---------------------------------------------------------

    @rule(data=st.data(), name=NAMES)
    def mkdir(self, data, name):
        d = data.draw(st.sampled_from(self._dirs()))
        path = self._join(d, name)
        exists = path in self.model
        try:
            self.ds.mkdir(self._inode(d), name)
            assert not exists, f"mkdir {path} should have failed"
            self.model[path] = None
        except E.CatalogError:
            assert exists, f"mkdir {path} should have succeeded"

    @rule(data=st.data(), name=NAMES, payload=PAYLOADS)
    def add_file(self, data, name, payload):
        d = data.draw(st.sampled_from(self._dirs()))
        path = self._join(d, name)
        exists = path in self.model
        try:
            self.ds.add_immutable_bytes(self._inode(d), name, payload)
            assert not exists, f"add {path} should have failed"
            self.model[path] = payload
        except E.CatalogError:
            assert exists, f"add {path} should have succeeded"

    @precondition(lambda self: len(self.model) > 1)
    @rule(data=st.data())
    def remove(self, data):
        path = data.draw(st.sampled_from(sorted(p for p in self.model if p != "/")))
        parent, name = path.rsplit("/", 1)
        parent = parent or "/"
        is_nonempty_dir = self.model[path] is None and bool(self._children(path))
        try:
            self.ds.remove(self._inode(parent), name)
            assert not is_nonempty_dir, f"rmdir non-empty {path} should fail"
            del self.model[path]
        except E.CatalogError:
            assert is_nonempty_dir, f"remove {path} should have succeeded"

    @precondition(lambda self: self._files())
    @rule(data=st.data(), name=NAMES)
    def rename_file(self, data, name):
        src = data.draw(st.sampled_from(self._files()))
        dst_dir = data.draw(st.sampled_from(self._dirs()))
        dst = self._join(dst_dir, name)
        if dst == src:
            return
        sp, sn = src.rsplit("/", 1)
        # destructive-replace semantics only when dest is a file or
        # absent (reference: core/datastore.go:820-832); renaming onto
        # a dir is refused
        dest_is_dir = self.model.get(dst, b"") is None and dst in self.model
        try:
            self.ds.rename(self._inode(sp or "/"), sn, self._inode(dst_dir), name)
            assert not dest_is_dir
            self.model[dst] = self.model.pop(src)
        except E.CatalogError:
            assert dest_is_dir

    @precondition(lambda self: self._files())
    @rule(data=st.data())
    def read_file(self, data):
        path = data.draw(st.sampled_from(self._files()))
        assert self.ds.read_path(path) == self.model[path]

    @rule()
    def freeze_idempotent(self):
        bid1 = self.ds.freeze()
        bid2 = self.ds.freeze()
        assert bid1 == bid2  # memoized, unchanged tree → same Merkle root

    @precondition(lambda self: self._files())
    @rule()
    def push_mount_roundtrip(self):
        self.push_count += 1
        label = f"snap{self.push_count}"
        self.ds.push(label)
        other = DataStore(
            self.tmp.name + f"/other{self.push_count}", remote=self.remote
        )
        mnt = other.mount_by_label(ROOT_INODE, "mnt", label)
        for path in self._files():
            got = other.read_path("/mnt" + path)
            assert got == self.model[path], f"roundtrip mismatch at {path}"
        assert other.get_node(mnt).is_dir

    # -- invariants ----------------------------------------------------

    @invariant()
    def listings_match_model(self):
        for d in self._dirs():
            got = {name for name, _ in self.ds.get_dir_contents(self._inode(d))}
            assert got == self._children(d), f"listing mismatch at {d}"


TestDataStoreProperties = FSMachine.TestCase
TestDataStoreProperties.settings = settings(
    max_examples=40, stateful_step_count=30, deadline=None
)
