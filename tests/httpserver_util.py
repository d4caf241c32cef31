"""Threaded in-process HTTP server for connector tests.

Serves a local directory the way a range-capable static server (nginx,
GCS XML API) would: GET with Range → 206 + Content-Range, ETag on
every file response, If-Match → 412 on mismatch, HEAD with size+ETag,
directory GET → the stdlib HTML index, plus PUT (WebDAV-style) so the
RemoteStore write side is testable. ``fail_next`` injects transient
503s to exercise the connector's bounded retries.
"""

from __future__ import annotations

import hashlib
import os
import re
import threading
from functools import partial
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer


class RangeETagHandler(SimpleHTTPRequestHandler):
    fail_next = 0  # class-level: next N file GET/HEADs answer 503

    # -- helpers --------------------------------------------------------

    def _etag(self, path: str) -> str:
        with open(path, "rb") as f:
            return '"%s"' % hashlib.sha256(f.read()).hexdigest()[:16]

    def _maybe_fail(self) -> bool:
        cls = type(self)
        if cls.fail_next > 0:
            cls.fail_next -= 1
            self.send_error(503, "injected transient failure")
            return True
        return False

    # -- verbs ----------------------------------------------------------

    def do_GET(self):
        path = self.translate_path(self.path)
        if os.path.isdir(path):
            return super().do_GET()  # stdlib HTML index
        if self._maybe_fail():
            return
        if not os.path.isfile(path):
            self.send_error(404)
            return
        etag = self._etag(path)
        im = self.headers.get("If-Match")
        if im is not None and im != etag:
            self.send_error(412, "ETag mismatch")
            return
        size = os.path.getsize(path)
        rng = self.headers.get("Range")
        with open(path, "rb") as f:
            if rng:
                m = re.match(r"bytes=(\d+)-(\d*)$", rng)
                start = int(m.group(1))
                end = int(m.group(2)) if m.group(2) else size - 1
                if start >= size:
                    self.send_error(416, "range past EOF")
                    return
                end = min(end, size - 1)
                f.seek(start)
                data = f.read(end - start + 1)
                self.send_response(206)
                self.send_header("Content-Range", f"bytes {start}-{end}/{size}")
            else:
                data = f.read()
                self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.send_header("ETag", etag)
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()
            self.wfile.write(data)

    def do_HEAD(self):
        path = self.translate_path(self.path)
        if os.path.isdir(path):
            return super().do_HEAD()
        if self._maybe_fail():
            return
        if not os.path.isfile(path):
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Length", str(os.path.getsize(path)))
        self.send_header("ETag", self._etag(path))
        self.send_header("Accept-Ranges", "bytes")
        self.end_headers()

    def do_PUT(self):
        path = self.translate_path(self.path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        n = int(self.headers.get("Content-Length", 0))
        data = self.rfile.read(n)
        with open(path, "wb") as f:
            f.write(data)
        self.send_response(201)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def log_message(self, *args):  # quiet
        pass


def start_server(directory: str) -> tuple[ThreadingHTTPServer, str]:
    """Serve ``directory`` on 127.0.0.1:<ephemeral>; returns (server, url)."""
    handler = partial(RangeETagHandler, directory=directory)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"
