"""Catalog table schemas (FIXTURES.md §1; derived from the reference's
data model: NodeRepr core/nodedb.go:27-43, BlockInfo core/freezer.go:51-59,
region log core/freezer.go:481-509, roots/leases remote/gcs.go:96-151).

The reference's Go ``interface{}`` remote-source union becomes a closed
STRUCT with a ``kind`` tag ('gcs' | 'url' | NULL) — only two kinds exist
(core/remote.go:9-20).
"""

from __future__ import annotations

from pyspark.sql import types as T

REMOTE_SOURCE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("bucket", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("generation", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("etag", T.StringType()),
        T.StructField("size", T.LongType()),
    ]
)

NODES = T.StructType(
    [
        T.StructField("inode", T.LongType(), False),
        T.StructField("parent", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("is_dir", T.BooleanType(), False),
        T.StructField("size", T.LongType(), False),
        T.StructField("mtime", T.TimestampType()),
        T.StructField("is_dirty", T.BooleanType(), False),
        T.StructField("bid", T.StringType()),
        T.StructField("deferred", T.BooleanType(), False),
        T.StructField("local_path", T.StringType()),
        T.StructField("remote_source", REMOTE_SOURCE),
    ]
)

BLOCKS = T.StructType(
    [
        T.StructField("bid", T.StringType(), False),
        T.StructField("size", T.LongType(), False),
        T.StructField("mtime", T.TimestampType()),
        T.StructField("pushed", T.BooleanType(), False),
        T.StructField("source", REMOTE_SOURCE),
    ]
)

REGIONS = T.StructType(
    [
        T.StructField("bid", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
    ]
)

ROOTS = T.StructType(
    [
        T.StructField("label", T.StringType(), False),
        T.StructField("bid", T.StringType(), False),
        T.StructField("lease_name", T.StringType()),
        T.StructField("expiry", T.TimestampType()),
    ]
)

TRANSFER_EVENTS = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("bid", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
        T.StructField("offset", T.LongType()),
    ]
)

# L3 extended-listing result schema (reference: api/api.proto:9-24)
DIR_ENTRY = T.StructType(
    [
        T.StructField("inode", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("is_dirty", T.BooleanType(), False),
        T.StructField("is_dir", T.BooleanType(), False),
        T.StructField("size", T.LongType(), False),
        T.StructField("mtime", T.TimestampType()),
        T.StructField("bid", T.StringType()),
        T.StructField("populated_region_count", T.LongType()),
        T.StructField("populated_size", T.LongType()),
    ]
)
