"""Remote object-store connectors.

The reference ships GCS (remote/gcs.go) and HTTP (remote/http.go)
connectors plus in-memory test fakes (core/mem_imps.go). Here the
production-shaped connector is a local-directory object store (usable
against any fuse/NFS/object mount in tests); GCS/HTTP are gated behind
import-try since those client libraries are not in this container.

Remote layout mirrors the reference:
- ``CAS/<bid>``       — pushed content-addressed blocks
  (remote/gcs.go:179-197); puts are if-absent (U2: the remote CAS is
  a set, remote/gcs.go:185).
- ``root/<label>``    — label → root-BID bindings (remote/gcs.go:114-151)
- ``lease/<name>``    — GC-root keepalives (remote/gcs.go:96-112)
"""

from __future__ import annotations

import json
import os
import tempfile
import time


class RemoteStore:
    """Interface all remotes implement."""

    def put_block_if_absent(self, bid: str, data: bytes) -> bool:
        raise NotImplementedError

    def has_block(self, bid: str) -> bool:
        raise NotImplementedError

    def get_block(self, bid: str) -> bytes:
        raise NotImplementedError

    def read_block(self, bid: str, offset: int, length: int) -> bytes:
        """S1/S4-shaped ranged read."""
        raise NotImplementedError

    def set_root(self, label: str, bid: str) -> None:
        raise NotImplementedError

    def get_root(self, label: str) -> str:
        raise NotImplementedError

    def set_lease(self, name: str, expiry: float, bid: str | None = None) -> None:
        """GC keepalive. ``bid`` pins a root block until ``expiry`` —
        the reference's lease carries the BID for exactly this
        (remote/gcs.go:96-112 ``Lease{Expiry, BID}``), so a just-pushed
        or superseded root survives GC until its lease runs out."""
        raise NotImplementedError

    # -- GC enumeration (optional per backend) --------------------------

    def get_roots(self) -> list[tuple[str, str]]:
        """[(label, bid)] — every labeled root binding."""
        raise NotImplementedError

    def get_leases(self) -> list[tuple[str, float, str | None]]:
        """[(name, expiry, bid)] — every lease, expired or not."""
        raise NotImplementedError

    def list_blocks(self) -> list[str]:
        """Every bid in the remote CAS. Driver-side listing — fine for
        the metadata tier; a 100TB CAS should instead feed GC from a
        bucket inventory table (collect_garbage accepts one)."""
        raise NotImplementedError

    def delete_block(self, bid: str) -> bool:
        """Remove a CAS block; False if it was already gone."""
        raise NotImplementedError


class MemRemote(RemoteStore):
    """In-memory fake (reference: core/mem_imps.go RemoteRefFactoryMem).

    Counts reads so tests can assert zero-remote-read cache hits
    (reference test core/freezer_test.go:72-118)."""

    def __init__(self):
        self.blocks: dict[str, bytes] = {}
        self.roots: dict[str, str] = {}
        self.leases: dict[str, tuple[float, str | None]] = {}
        self.read_count = 0
        self.bytes_read = 0

    def put_block_if_absent(self, bid: str, data: bytes) -> bool:
        if bid in self.blocks:
            return False
        self.blocks[bid] = data
        return True

    def has_block(self, bid: str) -> bool:
        return bid in self.blocks

    def get_block(self, bid: str) -> bytes:
        self.read_count += 1
        data = self.blocks[bid]
        self.bytes_read += len(data)
        return data

    def read_block(self, bid: str, offset: int, length: int) -> bytes:
        self.read_count += 1
        data = self.blocks[bid][offset : offset + length]
        self.bytes_read += len(data)
        return data

    def set_root(self, label: str, bid: str) -> None:
        self.roots[label] = bid

    def get_root(self, label: str) -> str:
        if label not in self.roots:
            raise KeyError(label)
        return self.roots[label]

    def set_lease(self, name: str, expiry: float, bid: str | None = None) -> None:
        self.leases[name] = (expiry, bid)

    def get_roots(self) -> list[tuple[str, str]]:
        return sorted(self.roots.items())

    def get_leases(self) -> list[tuple[str, float, str | None]]:
        return sorted((n, e, b) for n, (e, b) in self.leases.items())

    def list_blocks(self) -> list[str]:
        return sorted(self.blocks)

    def delete_block(self, bid: str) -> bool:
        return self.blocks.pop(bid, None) is not None


class LocalDirRemote(RemoteStore):
    """Object store over a local directory tree — the production-shaped
    connector in this container (swap for GCS/S3 via fsspec/hadoop on a
    cluster; executors write through the same layout in parallel)."""

    def __init__(self, root: str):
        self.root = root
        for sub in ("CAS", "root", "lease"):
            os.makedirs(os.path.join(root, sub), exist_ok=True)

    def _cas(self, bid: str) -> str:
        return os.path.join(self.root, "CAS", bid)

    def put_block_if_absent(self, bid: str, data: bytes) -> bool:
        dest = self._cas(bid)
        if os.path.exists(dest):
            return False
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(dest), prefix=".put-")
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.rename(tmp, dest)
        return True

    def has_block(self, bid: str) -> bool:
        return os.path.exists(self._cas(bid))

    def get_block(self, bid: str) -> bytes:
        with open(self._cas(bid), "rb") as f:
            return f.read()

    def read_block(self, bid: str, offset: int, length: int) -> bytes:
        with open(self._cas(bid), "rb") as f:
            f.seek(offset)
            return f.read(length)

    def _write_atomic(self, path: str, data: str) -> None:
        """Temp+rename: readers see the old or the new value, never a
        partial file. GCS objects (the reference's store,
        remote/gcs.go:114-151) are atomic this way by construction; a
        plain open(path, "w") here let a concurrent get_roots read an
        EMPTY label mid-write — which GC's data-loss guard then
        reported as a missing labeled root (rare chaos-test abort)."""
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(path), prefix=".w-"
        )
        with os.fdopen(fd, "w") as f:
            f.write(data)
        os.replace(tmp, path)

    def set_root(self, label: str, bid: str) -> None:
        self._write_atomic(os.path.join(self.root, "root", label), bid)

    def get_root(self, label: str) -> str:
        path = os.path.join(self.root, "root", label)
        if not os.path.exists(path):
            raise KeyError(label)
        with open(path) as f:
            return f.read().strip()

    def set_lease(self, name: str, expiry: float, bid: str | None = None) -> None:
        # JSON analog of the reference's gob-encoded Lease{Expiry, BID};
        # atomic for the same reason as set_root (a torn lease read
        # would drop a GC pin).
        self._write_atomic(
            os.path.join(self.root, "lease", name),
            json.dumps({"expiry": expiry, "bid": bid}),
        )

    def get_roots(self) -> list[tuple[str, str]]:
        d = os.path.join(self.root, "root")
        out = []
        for label in sorted(os.listdir(d)):
            if label.startswith(".w-"):  # in-flight atomic-write temp
                continue
            with open(os.path.join(d, label)) as f:
                out.append((label, f.read().strip()))
        return out

    def get_leases(self) -> list[tuple[str, float, str | None]]:
        d = os.path.join(self.root, "lease")
        out = []
        for name in sorted(os.listdir(d)):
            if name.startswith(".w-"):  # in-flight atomic-write temp
                continue
            with open(os.path.join(d, name)) as f:
                raw = f.read()
            try:
                rec = json.loads(raw)
                out.append((name, float(rec["expiry"]), rec.get("bid")))
            except (json.JSONDecodeError, KeyError, TypeError):
                out.append((name, float(raw), None))  # pre-BID lease files
        return out

    def list_blocks(self) -> list[str]:
        return sorted(
            b
            for b in os.listdir(os.path.join(self.root, "CAS"))
            if not b.startswith(".put-")  # in-flight tempfiles are not blocks
        )

    def delete_block(self, bid: str) -> bool:
        try:
            os.unlink(self._cas(bid))
            return True
        except FileNotFoundError:
            return False


class LocalFSLister:
    """S2 analog: one-level delimiter listing + ranged reads over a
    local directory tree — stands in for GCS/S3 prefix listing in this
    container (reference: getChildNodes, remote/gcs.go:258-300). The
    same two-method shape (list_prefix, read_key) is what a GCS/S3
    lister implements on a cluster."""

    def __init__(self, root: str):
        self.root = root

    def _abs(self, key: str) -> str:
        return os.path.join(self.root, key.lstrip("/")) if key else self.root

    def list_prefix(self, key: str) -> list[tuple[str, bool, int]]:
        """One level under ``key`` → [(name, is_dir, size)], name-sorted
        (the delimiter-'/' listing of S2)."""
        return [
            (name, is_dir, size)
            for name, is_dir, size, _gen, _etag in self.list_prefix_attrs(key)
        ]

    def list_prefix_attrs(
        self, key: str
    ) -> list[tuple[str, bool, int, int | None, str | None]]:
        """[(name, is_dir, size, generation, etag)] — the pinned listing.
        Generation here is st_mtime_ns, the local analog of a GCS object
        generation (reference listing carries it inline,
        remote/gcs.go:290-295)."""
        base = self._abs(key)
        out = []
        for name in sorted(os.listdir(base)):
            p = os.path.join(base, name)
            if os.path.isdir(p):
                out.append((name, True, 0, None, None))
            else:
                st = os.stat(p)
                out.append((name, False, st.st_size, st.st_mtime_ns, None))
        return out

    def read_key(
        self,
        key: str,
        offset: int = 0,
        length: int | None = None,
        generation: int | None = None,
        etag: str | None = None,
    ) -> bytes:
        """Ranged read; when ``generation`` is pinned, fail loudly if the
        backing file changed since listing (reference: GenerationMatch
        read conditions, remote/gcs.go:302-331)."""
        path = self._abs(key)
        if generation is not None:
            from pufs_spark.catalog.errors import StaleReadError

            now = os.stat(path).st_mtime_ns
            if now != generation:
                raise StaleReadError(
                    f"{key}: generation {now} != pinned {generation}"
                )
        with open(path, "rb") as f:
            f.seek(offset)
            return f.read(length) if length is not None else f.read()


def gcs_remote(bucket: str, prefix: str = ""):
    """GCS RemoteStore (import-gated; see sources/gcs.py for the full
    connector: delimiter listing with inline generations, pinned ranged
    reads, atomic if-absent CAS puts)."""
    from pufs_spark.sources.gcs import GCSRemote

    return GCSRemote(bucket, prefix)


DEFAULT_LEASE_SECONDS = 48 * 3600  # reference: core/datastore.go:48


def new_lease_expiry(now: float | None = None) -> float:
    return (now if now is not None else time.time()) + DEFAULT_LEASE_SECONDS
