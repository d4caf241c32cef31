"""GCS connector — the production object-store implementation of the
Lister + RemoteStore seams (reference: remote/gcs.go).

The google-cloud-storage client is NOT installed in this container, so
construction is import-gated and nothing here is exercised by the local
test suite; the class bodies are complete and mirror the reference's
observable behavior so a cluster deployment only needs the dependency:

- delimiter-'/' listing with inline size/generation
  (remote/gcs.go:258-300 getChildNodes),
- generation-pinned ranged reads — a read of a changed object FAILS
  rather than silently serving the new generation
  (remote/gcs.go:302-331 copyRegion with GenerationMatch),
- if-absent CAS puts: ifGenerationMatch=0 makes the put atomic at the
  server — the remote CAS is a set (remote/gcs.go:179-197),
- CAS/root/lease key layout (remote/gcs.go:203-205).

On a Spark cluster the bulk PARQUET path should go through the Hadoop
GCS connector (spark.read over gs:// URIs); these classes cover the
catalog seams — listing, pinned block reads, root/lease bookkeeping —
that the DataFrame reader does not.

The same two protocols are implemented by LocalFSLister/LocalDirRemote
(tests) and HTTPLister/HTTPRemote (tested over real sockets), so every
code path through DataStore/sparse/merkle that a GCSLister would drive
is covered by those stand-ins.
"""

from __future__ import annotations

from pufs_spark.catalog.errors import NotFoundError, StaleReadError
from pufs_spark.sources.remote import RemoteStore


def _client(project: str | None = None):
    try:
        from google.cloud import storage
    except ImportError as e:  # pragma: no cover - not in this container
        raise NotImplementedError(
            "google-cloud-storage is not installed in this environment; "
            "GCSLister/GCSRemote need it (pip install google-cloud-storage "
            "on the cluster image)"
        ) from e
    return storage.Client(project=project)


class GCSLister:  # pragma: no cover - requires GCS credentials + network
    """Lister over a bucket prefix: one-level delimiter listing with
    inline size/generation (S2/S3), generation-pinned ranged reads (S1).
    """

    def __init__(self, bucket: str, prefix: str = "", project: str | None = None):
        if prefix and not prefix.endswith("/"):
            prefix += "/"  # reference asserts this (remote/gcs.go:200-202)
        self.bucket_name = bucket
        self.prefix = prefix
        self.client = _client(project)
        self.bucket = self.client.bucket(bucket)

    def _key(self, key: str) -> str:
        return (self.prefix + key.lstrip("/")).lstrip("/")

    def list_prefix(self, key: str) -> list[tuple[str, bool, int]]:
        return [
            (name, is_dir, size)
            for name, is_dir, size, _g, _e in self.list_prefix_attrs(key)
        ]

    def list_prefix_attrs(
        self, key: str
    ) -> list[tuple[str, bool, int, int | None, str | None]]:
        """[(name, is_dir, size, generation, etag)] — generation comes
        inline from the listing (remote/gcs.go:290-295), no extra RPC."""
        base = self._key(key)
        if base and not base.endswith("/"):
            base += "/"
        it = self.client.list_blobs(
            self.bucket_name, prefix=base, delimiter="/"
        )
        files = []
        for blob in it:
            name = blob.name[len(base):]
            if not name:
                continue  # the prefix placeholder object itself
            files.append((name, False, blob.size, blob.generation, blob.etag))
        dirs = [
            (p[len(base):].rstrip("/"), True, 0, None, None)
            for p in it.prefixes
        ]
        return sorted(files + dirs)

    def read_key(
        self,
        key: str,
        offset: int = 0,
        length: int | None = None,
        generation: int | None = None,
        etag: str | None = None,
    ) -> bytes:
        """Ranged read, failing on generation mismatch — the pinned
        snapshot contract (remote/gcs.go:302-331)."""
        from google.api_core import exceptions as gexc

        blob = self.bucket.blob(self._key(key))
        end = None if length is None else offset + length - 1
        try:
            return blob.download_as_bytes(
                start=offset or None,
                end=end,
                if_generation_match=generation,
            )
        except gexc.PreconditionFailed as e:
            raise StaleReadError(
                f"{key}: generation changed since pin {generation}"
            ) from e
        except gexc.NotFound as e:
            raise NotFoundError(key) from e


class GCSRemote(RemoteStore):  # pragma: no cover - requires GCS
    """RemoteStore over the CAS/root/lease layout of a bucket prefix
    (remote/gcs.go:203-205)."""

    def __init__(self, bucket: str, prefix: str = "", project: str | None = None):
        if prefix and not prefix.endswith("/"):
            prefix += "/"
        self.client = _client(project)
        self.bucket = self.client.bucket(bucket)
        self.prefix = prefix

    def _blob(self, *parts: str):
        return self.bucket.blob(self.prefix + "/".join(parts))

    def put_block_if_absent(self, bid: str, data: bytes) -> bool:
        """Atomic if-absent at the server: ifGenerationMatch=0 only
        succeeds when no live generation exists (U2: the CAS is a set —
        remote/gcs.go:185's upload path)."""
        from google.api_core import exceptions as gexc

        try:
            self._blob("CAS/", bid).upload_from_string(
                data, if_generation_match=0
            )
            return True
        except gexc.PreconditionFailed:
            return False

    def has_block(self, bid: str) -> bool:
        return self._blob("CAS/", bid).exists()

    def get_block(self, bid: str) -> bytes:
        from google.api_core import exceptions as gexc

        try:
            return self._blob("CAS/", bid).download_as_bytes()
        except gexc.NotFound as e:
            raise NotFoundError(bid) from e

    def read_block(self, bid: str, offset: int, length: int) -> bytes:
        from google.api_core import exceptions as gexc

        try:
            return self._blob("CAS/", bid).download_as_bytes(
                start=offset, end=offset + length - 1
            )
        except gexc.NotFound as e:
            raise NotFoundError(bid) from e

    def set_root(self, label: str, bid: str) -> None:
        self._blob("root/", label).upload_from_string(bid.encode())

    def get_root(self, label: str) -> str:
        from google.api_core import exceptions as gexc

        try:
            return (
                self._blob("root/", label).download_as_bytes().decode().strip()
            )
        except gexc.NotFound:
            raise KeyError(label) from None

    def set_lease(self, name: str, expiry: float, bid: str | None = None) -> None:
        import json

        self._blob("lease/", name).upload_from_string(
            json.dumps({"expiry": expiry, "bid": bid}).encode()
        )

    def get_roots(self) -> list[tuple[str, str]]:
        pre = self.prefix + "root/"
        return sorted(
            (b.name[len(pre):], b.download_as_bytes().decode().strip())
            for b in self.client.list_blobs(self.bucket, prefix=pre)
        )

    def get_leases(self) -> list[tuple[str, float, str | None]]:
        import json

        pre = self.prefix + "lease/"
        out = []
        for b in self.client.list_blobs(self.bucket, prefix=pre):
            raw = b.download_as_bytes().decode()
            try:
                rec = json.loads(raw)
                out.append((b.name[len(pre):], float(rec["expiry"]), rec.get("bid")))
            except (json.JSONDecodeError, KeyError, TypeError):
                out.append((b.name[len(pre):], float(raw), None))
        return sorted(out)

    def list_blocks(self) -> list[str]:
        pre = self.prefix + "CAS/"
        return sorted(
            b.name[len(pre):]
            for b in self.client.list_blobs(self.bucket, prefix=pre)
        )

    def delete_block(self, bid: str) -> bool:
        from google.api_core import exceptions as gexc

        try:
            self._blob("CAS/", bid).delete()
            return True
        except gexc.NotFound:
            return False
