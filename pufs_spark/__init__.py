"""pufs_spark — a PySpark-native engine with the query and data-processing
capabilities of the puFS reference (content-addressed lazy-caching data lake).

Architecture (Spark-first, not a port):

- ``catalog``    — the inode/blocks/regions tables as DataFrames + a
                   single-writer driver-side DataStore mirroring the
                   reference's verbs (reference: core/datastore.go,
                   core/nodedb.go).
- ``operators``  — distributed operators: interval algebra
                   (reference: region/region.go), dedup, similarity
                   search, text analysis (north-star extensions).
- ``plans``      — multi-stage jobs: Merkle freeze / push / mount
                   (reference: core/datastore.go:999-1217).
- ``sources``    — remote connectors + the content-addressed store
                   (reference: remote/gcs.go, remote/http.go,
                   core/freezer.go).
- ``functions``  — scalar helpers (hashing, human sizes).
- ``streaming``  — transfer monitoring over an event log
                   (reference: region/pending.go, core/freezer.go).
"""

__version__ = "0.1.0"

from pufs_spark.session import get_spark  # noqa: F401
