"""`pufs` Python Data Source — vanilla ``spark.read`` over a frozen
tree (SURVEY §7.3 step 7; the reference's consumption surface is a FUSE
mount, fs/mount.go — ours is a Spark scan).

Usage:
    from pufs_spark.sources.datasource import PufsDataSource
    spark.dataSource.register(PufsDataSource)
    df = (spark.read.format("pufs")
          .option("catalog", "/path/to/catalog.parquet")   # export_catalog
          .option("cas", "/path/to/freezer/chunks")        # CAS dir
          .option("path", "/subtree")                      # optional filter
          .load())
    # → (path, inode, size, bid, content binary), one partition per file

The catalog is the parquet file written by
``catalog.datastore.export_catalog`` (full path per node precomputed —
the reference's path-resolution loop done once at export). Partition
planning happens driver-side from catalog metadata only; executors
open CAS blocks directly, so a scan of a 10⁶-file tree fans out without
the driver touching a single data byte. Metadata-only scans skip CAS reads
entirely via ``.option("content", "false")`` (the Python DS API does
not yet push column pruning into the reader).

Service surface (S12) mapping — the reference exposes a gRPC API
(api/api.proto:4-28, served from pufs/cmd/mount.go:114-141); here each
RPC maps onto an engine entry point reachable from ANY Spark client,
including remote ones via Spark Connect (`sc://host` — the thin-
endpoint story: run one Connect server beside the CAS, every RPC below
becomes a DataFrame call over the wire, no bespoke service code):

    GetDirContents   → catalog.queries.dir_listing / listing_extended
    GetAttr          → catalog.queries getattr projection (P3)
    Freeze           → plans.merkle.freeze_nodes_df (F1)
    Push             → plans.merkle.unpushed + push_blocks (F2/F3)
    Mount/Unmount    → DataStore.mount_label / unmount (F4/F5)
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = "path string, inode long, size long, bid string, content binary"


class PufsFilePartition(InputPartition):
    def __init__(self, rows: list[tuple[str, int, int, str]]):
        self.rows = rows


class PufsDataSource(DataSource):
    """One row per frozen file under the requested path."""

    @classmethod
    def name(cls) -> str:
        return "pufs"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):
        return PufsReader(self.options, schema)


class PufsReader(DataSourceReader):
    def __init__(self, options, schema):
        self.catalog = options["catalog"]
        self.cas = options["cas"]
        self.prefix = options.get("path", "/").rstrip("/") or "/"
        # The Python DS API hands the reader the full schema (no column
        # pruning pushdown yet), so metadata-only scans opt out of CAS
        # reads explicitly with .option("content", "false").
        self.want_content = options.get("content", "true").lower() != "false" and any(
            f.name == "content" for f in schema.fields
        )
        self.files_per_partition = int(options.get("filesperpartition", 64))

    def _file_rows(self) -> list[tuple[str, int, int, str]]:
        import pyarrow.parquet as pq

        t = pq.read_table(self.catalog, columns=["path", "inode", "size", "bid", "is_dir"])
        rows = []
        for path, inode, size, bid, is_dir in zip(
            t["path"].to_pylist(),
            t["inode"].to_pylist(),
            t["size"].to_pylist(),
            t["bid"].to_pylist(),
            t["is_dir"].to_pylist(),
        ):
            if is_dir or bid is None:
                continue
            if self.prefix != "/" and not (
                path == self.prefix or path.startswith(self.prefix + "/")
            ):
                continue
            rows.append((path, inode, size, bid))
        return rows

    def partitions(self):
        rows = sorted(self._file_rows())
        n = self.files_per_partition
        return [
            PufsFilePartition(rows[i : i + n]) for i in range(0, len(rows), n)
        ] or [PufsFilePartition([])]

    def read(self, partition: PufsFilePartition):
        for path, inode, size, bid in partition.rows:
            content = None
            if self.want_content:
                with open(os.path.join(self.cas, bid), "rb") as f:
                    content = f.read()
            yield (path, inode, size, bid, content)
