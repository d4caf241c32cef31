"""S12: the catalog metadata service — the reference's gRPC surface.

The reference serves ``GetDirContents`` over gRPC (``api/api.proto:4-28``,
wired in ``pufs/cmd/mount.go:114-141``): path in, a repeated ``Entry``
(id, name, isDirty, isDir, size, modTimeSeconds, blockID,
populatedRegionCount, populatedSize) plus an in-band ``errorMsg`` out.

Spark-first, the primary result sink is a DataFrame (every ``queries()``
entry) and the ``pufs`` data source for vanilla ``spark.read`` — but the
*network seam* still matters: an operator wants to poke a live catalog
without a SparkSession. gRPC/protobuf aren't in this container, so the
same service shape is spoken as newline-delimited JSON over TCP — one
request object per line, one response object per line, field names
matching the proto so a gRPC transport could be swapped in without
touching the handler logic:

    {"op": "get_dir_contents", "path": "/a"}
      -> {"entries": [{"id": 2, "name": "f", "isDirty": false,
                       "isDir": false, "size": 3,
                       "modTimeSeconds": 1700000000,
                       "blockId": "<bid>", "populatedRegionCount": 0,
                       "populatedSize": 0}], "errorMsg": ""}

Errors are in-band (``errorMsg``), exactly like the proto — the
transport never sees an exception. Extra ops beyond the reference's
single rpc (all read-only): ``getattr``, ``resolve``, ``read`` (ranged,
base64 payload), ``stat`` (catalog totals).
"""

from __future__ import annotations

import base64
import json
import socket
import socketserver
import threading

from pufs_spark.catalog import errors as E
from pufs_spark.catalog.datastore import DataStore


def _entry_dict(e, region_stats=None) -> dict:
    """DirEntry -> proto Entry field names (api/api.proto:10-24)."""
    prc, psz = (0, 0)
    if region_stats is not None and e.bid and not e.is_dir:
        prc, psz = region_stats(e.bid)
    return {
        "id": e.inode,
        "name": e.name,
        "isDirty": e.is_dirty,
        "isDir": e.is_dir,
        "size": e.size,
        "modTimeSeconds": int(e.mtime),
        "blockId": e.bid or "",
        "populatedRegionCount": prc,
        "populatedSize": psz,
    }


class PufsService:
    """Request dispatcher over one DataStore. Transport-agnostic: the
    TCP server below and the tests both call ``handle`` directly.

    ``region_stats``: optional ``bid -> (count, bytes)`` callable (wired
    to ``SparseFreezer.region_stats`` when a sparse cache backs the
    store) filling the proto's populated* fields, as the reference does
    from its region map (core/datastore.go:391-466)."""

    def __init__(self, store: DataStore, region_stats=None):
        self.store = store
        self.region_stats = region_stats
        # One catalog mutator at a time server-side; the store itself
        # is the reference's single-writer model (SURVEY §3.1) and
        # lazy listing expansion mutates internal maps.
        self._lock = threading.Lock()

    def handle(self, req: dict) -> dict:
        try:
            op = req.get("op")
            if op == "get_dir_contents":
                return self._get_dir_contents(req["path"])
            if op == "getattr":
                return self._getattr(req["path"])
            if op == "resolve":
                with self._lock:
                    return {"id": self.store.resolve_path(req["path"]),
                            "errorMsg": ""}
            if op == "read":
                return self._read(
                    req["path"], req.get("offset", 0), req.get("length")
                )
            if op == "stat":
                return self._stat()
            return {"errorMsg": f"unknown op {op!r}"}
        except E.CatalogError as exc:
            # in-band, typed: the proto's errorMsg field
            return {"errorMsg": f"{type(exc).__name__}: {exc}"}
        except KeyError as exc:
            return {"errorMsg": f"missing field {exc}"}

    def _get_dir_contents(self, path: str) -> dict:
        with self._lock:
            inode = self.store.resolve_path(path)
            entries = self.store.walk_dir_contents(inode)
        return {
            "entries": [
                _entry_dict(e, self.region_stats) for e in entries
            ],
            "errorMsg": "",
        }

    def _getattr(self, path: str) -> dict:
        with self._lock:
            attrs = self.store.getattr(self.store.resolve_path(path))
        return {**attrs, "errorMsg": ""}

    def _read(self, path: str, offset: int, length: int | None) -> dict:
        with self._lock:
            inode = self.store.resolve_path(path)
            data = self.store.read(inode, offset=offset, length=length)
        return {
            "data": base64.b64encode(data).decode(),
            "n": len(data),
            "errorMsg": "",
        }

    def _stat(self) -> dict:
        with self._lock:
            nodes = list(self.store.nodes.values())
        return {
            "nodes": len(nodes),
            "dirs": sum(1 for n in nodes if n.is_dir),
            "files": sum(1 for n in nodes if not n.is_dir),
            "bytes": sum(n.size for n in nodes if not n.is_dir),
            "errorMsg": "",
        }


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):  # one connection, many requests (like a channel)
        while True:
            line = self.rfile.readline()
            if not line:
                return
            try:
                req = json.loads(line)
            except json.JSONDecodeError as exc:
                resp = {"errorMsg": f"bad request: {exc}"}
            else:
                resp = self.server.service.handle(req)
            self.wfile.write(json.dumps(resp).encode() + b"\n")
            self.wfile.flush()


class PufsServer(socketserver.ThreadingTCPServer):
    """``serve(store)`` → (server, port); call ``shutdown()`` to stop."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, service: PufsService, host: str = "127.0.0.1",
                 port: int = 0):
        super().__init__((host, port), _Handler)
        self.service = service


def serve(
    store: DataStore, region_stats=None, host: str = "127.0.0.1",
    port: int = 0,
) -> tuple[PufsServer, int]:
    """Start serving ``store`` on a background thread; returns the
    server and its bound port (``port=0`` picks a free one)."""
    server = PufsServer(PufsService(store, region_stats), host, port)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, server.server_address[1]


class PufsClient:
    """Line-protocol client (the test double for a gRPC stub)."""

    def __init__(self, host: str, port: int, timeout: float = 10.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.rfile = self.sock.makefile("rb")

    def call(self, **req) -> dict:
        self.sock.sendall(json.dumps(req).encode() + b"\n")
        return json.loads(self.rfile.readline())

    def get_dir_contents(self, path: str) -> dict:
        return self.call(op="get_dir_contents", path=path)

    def read_bytes(self, path: str, offset: int = 0,
                   length: int | None = None) -> bytes:
        resp = self.call(op="read", path=path, offset=offset,
                         length=length)
        if resp.get("errorMsg"):
            raise E.CatalogError(resp["errorMsg"])
        return base64.b64decode(resp["data"])

    def close(self):
        self.sock.close()
