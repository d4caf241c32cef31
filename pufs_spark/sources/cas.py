"""Content-addressed block store ("freezer").

Reference behavior: core/freezer.go — blocks are immutable byte blobs
named by the lowercase-hex SHA-256 of their content, laid out under
``<root>/chunks/<bid>``; adding the same content twice collapses to one
entry (U1, core/freezer.go:672-711). Writes are staged to a temp file
then atomically renamed (the reference's os.Rename add path).

Hex (not the reference's base64url) is used so BIDs equal Spark's
``sha2(col, 256)`` and DuckDB's ``sha256(...)`` output directly —
the whole engine agrees on one BID spelling.
"""

from __future__ import annotations

import hashlib
import os
import tempfile


def bid_of_bytes(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


class Freezer:
    """Local CAS directory. Single-writer driver-side mutations; the
    distributed ingest path (many files hashed executor-side) lives in
    plans/merkle.py and writes through the same layout."""

    def __init__(self, root: str):
        self.root = root
        self.chunks_dir = os.path.join(root, "chunks")
        os.makedirs(self.chunks_dir, exist_ok=True)

    def _path(self, bid: str) -> str:
        return os.path.join(self.chunks_dir, bid)

    def has_block(self, bid: str) -> bool:
        return os.path.exists(self._path(bid))

    def add_bytes(self, data: bytes) -> str:
        """S8: hash → write-if-absent via temp + atomic rename."""
        bid = bid_of_bytes(data)
        dest = self._path(bid)
        if not os.path.exists(dest):
            fd, tmp = tempfile.mkstemp(dir=self.chunks_dir, prefix=".staging-")
            try:
                with os.fdopen(fd, "wb") as f:
                    f.write(data)
                os.rename(tmp, dest)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        return bid

    def put_named(self, bid: str, data: bytes) -> None:
        """S9: store content under a SYNTHETIC bid (remote-pinned
        identity, not a content hash) — the reference's remote-attach
        path (core/freezer.go:713-743)."""
        dest = self._path(bid)
        if not os.path.exists(dest):
            fd, tmp = tempfile.mkstemp(dir=self.chunks_dir, prefix=".staging-")
            try:
                with os.fdopen(fd, "wb") as f:
                    f.write(data)
                os.rename(tmp, dest)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)

    def add_file(self, path: str) -> str:
        with open(path, "rb") as f:
            return self.add_bytes(f.read())

    def get_bytes(self, bid: str) -> bytes:
        with open(self._path(bid), "rb") as f:
            return f.read()

    def read(self, bid: str, offset: int = 0, length: int | None = None) -> bytes:
        with open(self._path(bid), "rb") as f:
            f.seek(offset)
            return f.read(length) if length is not None else f.read()

    def size(self, bid: str) -> int:
        return os.path.getsize(self._path(bid))

    def list_bids(self) -> list[str]:
        return [n for n in os.listdir(self.chunks_dir) if not n.startswith(".")]
