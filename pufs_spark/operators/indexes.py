"""Maintenance for the persisted bucketed indexes (BM25 postings —
text.build_bm25_index; near-dup LSH — dedup.build_near_dup_index; IVF
— similarity.build_ann_index).

The incremental update paths (``update_bm25_index``,
``update_near_dup_index``) append each batch's files under the
existing bucket spec — correct and cheap per batch, but a standing
ingest service accumulates unboundedly many small files per bucket
(the classic streaming-ingest small-file problem): scan setup cost
grows with file count even when bucket pruning is perfect, and at
100TB ingest cadence the listing itself becomes the bottleneck.
``compact_index`` is the counterpart: a bucket-preserving rewrite that
folds a table's files back to one file per bucket, preserving the
bucket/sort spec (discovered from the catalog, so it works on any of
the indexes), the table name, and query results exactly.

This module also carries the shared EXACTLY-ONCE machinery for the
incremental appends: ``guarded_append`` wraps an index append in a
commit marker kept in a one-row ``<table>_meta`` table (intent with a
pre-append file-listing snapshot → append → commit onto an
applied-batch ring), so a foreachBatch at-least-once replay re-applies
exactly the appends that didn't land — Spark appends are all-or-nothing
at job commit, so "did it land" is decidable by re-listing. Used by
``dedup.update_near_dup_index`` and ``similarity.update_ann_index``;
``text.update_bm25_index`` runs the same protocol inline in its stats
row because its commit also folds exact stats.

Not concurrent-safe: compaction drops and renames tables; run it from
the ingest loop at a quiet point (the same discipline as Delta's
OPTIMIZE). The swap order — write new data to a NEW path, drop the old
table, rename the new table over the old name, delete the old files —
means a crash mid-compact loses no DATA: the rows always live in at
least one of the two tables. The NAME, however, has a window: between
the DROP and the RENAME neither table answers to ``table``, so a crash
there leaves the rows only under ``<table>__compact``.
``recover_interrupted_swap`` (called on entry by ``compact_index``,
``needs_compaction``, and the ingest loop) detects that state — table
missing, ``__compact`` present — and completes the rename, so a
restarted service self-heals before touching the index.
"""

from __future__ import annotations

import re
import shutil
from urllib.parse import urlparse

from pyspark.sql.functions import col as F_col


def table_location(spark, table: str) -> str:
    """The table's storage location (a URI) from the catalog."""
    for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect():
        if r["col_name"].strip() == "Location":
            return r["data_type"].strip()
    raise ValueError(f"table {table} has no Location (not an external table?)")


def _bucket_spec(spark, table: str) -> tuple[int, list[str], list[str]]:
    """(num_buckets, bucket_cols, sort_cols) from DESCRIBE FORMATTED."""
    info = {
        r["col_name"].strip(): (r["data_type"] or "").strip()
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    }
    if "Num Buckets" not in info:
        raise ValueError(f"table {table} is not bucketed")
    cols = lambda s: re.findall(r"`([^`]+)`", s)  # noqa: E731
    return (
        int(info["Num Buckets"]),
        cols(info.get("Bucket Columns", "")),
        cols(info.get("Sort Columns", "")),
    )


def _local_path(location: str) -> str | None:
    """Filesystem path for a file:-scheme location; None otherwise."""
    u = urlparse(location)
    if u.scheme in ("", "file"):
        return u.path
    return None


def list_table_files(spark, table: str) -> list[tuple[str, int]]:
    """(path, size) of every data file backing ``table``, via a
    Hadoop-FS listing of its location — O(files), no Spark job, no row
    scan, any scheme the session's Hadoop conf can reach (file:, hdfs:,
    s3a:, gs:). A missing location lists as empty.

    EVERY path component under the location is checked for a hidden/
    metadata prefix, not just the basename: a crashed (never-committed)
    Spark append leaves completed task files under
    ``<location>/_temporary/0/task_*/part-*.parquet`` whose BASENAMES
    look like data files. Counting those would make ``files_snapshot``
    misread a dead append as landed — the commit markers would then
    mark a batch applied whose data Spark never committed (and never
    reads: scans ignore ``_``-prefixed directories the same way)."""
    loc = table_location(spark, table)
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(loc)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    # URI paths compare scheme-insensitively (listFiles yields
    # file:/... while DESCRIBE may report a bare /... location)
    base = jpath.toUri().getPath().rstrip("/") + "/"
    out: list[tuple[str, int]] = []
    try:
        it = fs.listFiles(jpath, True)
        while it.hasNext():
            f = it.next()
            upath = f.getPath().toUri().getPath()
            tail = (
                upath[len(base):]
                if upath.startswith(base)
                else upath.rsplit("/", 1)[-1]
            )
            if any(c.startswith(("_", ".")) for c in tail.split("/") if c):
                continue
            out.append((f.getPath().toString(), f.getLen()))
    except Exception as exc:  # noqa: BLE001 — py4j wraps FileNotFoundException
        if "FileNotFoundException" in type(exc).__name__ + str(exc):
            return []
        raise
    return out


def files_snapshot(spark, table: str) -> tuple[int, str]:
    """(count, digest) of the table's current data-file listing — the
    commit-marker probe the incremental index updates use to decide,
    after a crash, whether a pending postings append LANDED (Spark's
    job commit is all-or-nothing, so the listing either equals the
    pre-append snapshot or differs)."""
    import hashlib

    files = sorted(f"{p}:{n}" for p, n in list_table_files(spark, table))
    return len(files), hashlib.md5("\n".join(files).encode()).hexdigest()


def index_file_count(spark, table: str) -> int:
    """Number of data files backing ``table`` — the compaction signal.
    A filesystem listing of the table location (O(files) — the very
    quantity being bounded), NOT a row scan: a standing ingest loop
    calls this every batch, and an input_file_name() scan would be an
    O(corpus-rows) job per batch."""
    return len(list_table_files(spark, table))


_META_SCHEMA = (
    "_batches array<string>, "
    "_pending struct<id: string, nfiles: bigint, fhash: string>"
)
# Ring size for applied-batch ids (replays come from the immediately
# retried batch; monotone checkpoint batch ids preclude older ones).
META_BATCH_RING = 64


def read_index_meta(spark, table: str) -> tuple[list[str], object]:
    """(applied batch-id ring, pending intent Row or None) from the
    index's ``<table>_meta`` one-row table; ([], None) when the index
    predates the meta table (it is then created on the first guarded
    update) — or when the table exists but holds NO row: the marker
    rewrite is a tiny Spark overwrite whose delete-then-move commit is
    not atomic, so a crash inside it can empty the table. Treating
    that as a fresh ring un-wedges the service (the alternative is an
    unrecoverable IndexError loop); the residual is that a replay of
    the batch whose COMMIT crashed can re-append — the one window an
    atomic metadata store would close, out of proportion for a
    one-row table."""
    meta_t = f"{table}_meta"
    if not spark.catalog.tableExists(meta_t):
        return [], None
    rows = spark.table(meta_t).collect()
    if not rows:
        return [], None
    row = rows[0].asDict()
    return list(row.get("_batches") or []), row.get("_pending")


def write_index_meta(spark, table: str, applied: list[str], pending) -> None:
    """Atomically rewrite the one-row meta table (single tiny file),
    creating it next to the index (``<location>_meta``) if absent."""
    meta_t = f"{table}_meta"
    df = spark.createDataFrame([(applied, pending)], _META_SCHEMA)
    if spark.catalog.tableExists(meta_t):
        df.write.mode("overwrite").insertInto(meta_t, overwrite=True)
    else:
        loc = f"{table_location(spark, table)}_meta"
        df.write.option("path", loc).mode("overwrite").saveAsTable(meta_t)


# -- applied-marker files -------------------------------------------------
#
# The one-row meta/stats tables are rewritten by a tiny Spark overwrite
# whose delete-then-move commit is NOT atomic: a crash inside the COMMIT
# rewrite can empty the table, and the recovered (empty) applied ring
# would let a replay of precisely that batch re-append (the r7 verdict's
# "one-row marker residual", ROADMAP weak spot 8). The closure is the
# commitlog.py atomic-claim pattern: after a batch's append lands, an
# ``applied-<md5(batch_id)>`` file is created (Hadoop FS createNewFile —
# atomic on local and HDFS) in a sidecar dir BEFORE the ring rewrite, so
# "was this batch applied" survives any crash in the tiny table rewrite.
# The sidecar hangs off the META/STATS table's location (not the index's):
# compaction moves the postings table but never its one-row sibling, so
# markers stay put across compactions.


def _sidecar_base(spark, table: str) -> str:
    """Anchor path for the index's tiny sidecars (marker files, id
    bloom): the META/STATS table's location, not the index's —
    compaction moves the postings table but never its one-row sibling,
    so sidecars stay put across compactions."""
    meta_t, stats_t = f"{table}_meta", f"{table}_stats"
    if spark.catalog.tableExists(meta_t):
        return table_location(spark, meta_t)
    if spark.catalog.tableExists(stats_t):
        return table_location(spark, stats_t)
    return f"{table_location(spark, table)}_meta"


def _marker_dir(spark, table: str) -> str:
    return f"{_sidecar_base(spark, table)}_markers"


def _marker_fs(spark, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _marker_name(batch_id: str) -> str:
    import hashlib

    return f"applied-{hashlib.md5(str(batch_id).encode()).hexdigest()}"


def applied_marker_exists(spark, table: str, batch_id: str) -> bool:
    fs, p = _marker_fs(
        spark, f"{_marker_dir(spark, table)}/{_marker_name(batch_id)}"
    )
    return fs.exists(p)


def write_applied_marker(spark, table: str, batch_id: str) -> None:
    """Atomically claim ``batch_id`` as applied (idempotent: an existing
    marker is success). Prunes the sidecar to the newest
    2×META_BATCH_RING markers by modification time — same replay-window
    rationale as the ring itself."""
    fs, p = _marker_fs(
        spark, f"{_marker_dir(spark, table)}/{_marker_name(batch_id)}"
    )
    fs.mkdirs(p.getParent())
    fs.createNewFile(p)
    statuses = list(fs.listStatus(p.getParent()))
    if len(statuses) > 2 * META_BATCH_RING:
        statuses.sort(key=lambda s: s.getModificationTime())
        for s in statuses[: len(statuses) - 2 * META_BATCH_RING]:
            fs.delete(s.getPath(), False)


def _settle_meta_pending(spark, table: str, applied: list[str], pend):
    """Resolve a leftover intent in ``<table>_meta``: the file listing
    changed since the intent's snapshot → the append LANDED (mark its
    id applied, ring + marker file); unchanged → it never landed (drop
    the intent; a replay redoes it). Returns (new ring, landed id or
    None)."""
    landed = files_snapshot(spark, table) != (pend["nfiles"], pend["fhash"])
    if landed:
        if pend["id"] not in applied:
            applied = (applied + [pend["id"]])[-META_BATCH_RING:]
        write_applied_marker(spark, table, pend["id"])
    write_index_meta(spark, table, applied, None)
    return applied, (pend["id"] if landed else None)


def reconcile_pending(spark, table: str) -> bool:
    """Settle any leftover commit-marker intent for ``table`` BEFORE a
    file-layout change (compaction, vacuum): landed-ness is decided by
    comparing file listings, so probing AFTER the layout changed would
    misread a never-landed append as landed and silently drop that
    batch's rows (ADVICE r8). Handles both marker styles — the
    ``<table>_meta`` guarded_append protocol and the BM25 stats-row
    twin. Returns True iff an intent was settled."""
    did = False
    applied, pend = read_index_meta(spark, table)
    if pend is not None and pend["id"] is not None:
        _settle_meta_pending(spark, table, applied, pend)
        did = True
    if spark.catalog.tableExists(f"{table}_stats"):
        from pufs_spark.operators import text

        did = text.reconcile_bm25_pending(spark, table) or did
    return did


def guarded_append(spark, table: str, batch_id: str | None, do_append) -> bool:
    """Run ``do_append()`` (an all-or-nothing Spark append into
    ``table``) exactly once per ``batch_id`` across at-least-once
    replays, using a commit marker in ``<table>_meta`` plus an
    applied-marker file:

    1. a replay of an applied id (ring OR marker file) returns without
       touching the table;
    2. INTENT — record (batch_id, pre-append file-listing snapshot);
    3. APPEND;
    4. claim the applied-marker file (atomic createNewFile — survives
       any crash in step 5's non-atomic one-row rewrite);
    5. COMMIT — push the id onto the applied ring, clear the intent.

    On entry, a leftover intent from a crashed call is reconciled by
    re-listing the table: listing changed → that append landed (mark
    its id applied); unchanged → it never landed (drop the intent; the
    replay redoes it). ``batch_id=None`` skips the marker entirely
    (caller accepts replay duplicates). Returns True iff the append
    ran.

    REPLAY HORIZON (caller contract): replay detection is bounded —
    the ring keeps the newest ``META_BATCH_RING`` ids and the marker
    sidecar the newest ~``2×META_BATCH_RING`` files by mtime — so a
    replay arriving MORE than ~2×META_BATCH_RING batches late is
    indistinguishable from a fresh batch and re-appends. That bound is
    sound for the intended caller, a streaming ``foreachBatch`` loop:
    checkpoint batch ids are monotone and a replay is always the
    immediately-retried batch, never one ~128 batches stale. A
    non-streaming caller minting ARBITRARY ids gets exactly this
    weaker guarantee and must either keep its own applied set or
    route ids so no replay can be older than the horizon (the ids are
    opaque strings, so an out-of-horizon arrival cannot be detected
    here even in principle — there is no order to compare against).
    The ingest loop's id-freshness guard is the backstop: a
    beyond-horizon replay re-appending its DOC ids trips
    ``BatchIdCollisionError`` before any fold."""
    if batch_id is None:
        do_append()
        return True
    applied, pend = read_index_meta(spark, table)
    settle = pend is not None and pend["id"] is not None
    if batch_id in applied or applied_marker_exists(spark, table, batch_id):
        if settle:  # leftover intent from the crash that lost the ring
            _settle_meta_pending(spark, table, applied, pend)
        return False
    if settle:
        applied, landed_id = _settle_meta_pending(spark, table, applied, pend)
        if landed_id == batch_id:
            return False  # this very batch: the crashed append landed
    nfiles, fhash = files_snapshot(spark, table)
    write_index_meta(spark, table, applied, (batch_id, nfiles, fhash))
    do_append()
    write_applied_marker(spark, table, batch_id)
    applied = (applied + [batch_id])[-META_BATCH_RING:]
    write_index_meta(spark, table, applied, None)
    return True


def recover_interrupted_swap(spark, table: str) -> bool:
    """Complete a ``compact_index`` swap that crashed between the DROP
    and the RENAME (the one window in which ``table`` doesn't answer to
    its name): if the table is missing but ``<table>__compact`` exists,
    rename it into place. Idempotent; returns True iff a recovery
    happened. Safe to call any time the tables are quiescent — the
    ingest loop runs it at entry so a restarted service self-heals."""
    tmp = f"{table}__compact"
    if not spark.catalog.tableExists(table) and spark.catalog.tableExists(tmp):
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
        return True
    return False


def needs_compaction(spark, table: str, max_files_per_bucket: int = 8) -> bool:
    """True when the table's file count exceeds
    ``max_files_per_bucket`` × num_buckets (each clean build/compact
    leaves exactly one file per non-empty bucket, and each incremental
    update appends up to one more per bucket)."""
    recover_interrupted_swap(spark, table)
    n_buckets, _, _ = _bucket_spec(spark, table)
    return index_file_count(spark, table) > max_files_per_bucket * n_buckets


def compact_index(spark, table: str, new_path: str) -> str:
    """Rewrite ``table`` bucket-preserving into ``new_path`` and swap
    it under the same name: queries before and after see identical
    rows, the bucket/sort spec (and therefore every pruned-scan plan)
    is preserved, and the file count drops back to ≤ one per bucket.
    Old files are deleted for local (file:) tables, left for the
    caller otherwise. Returns the new location.

    Any leftover commit-marker intent is settled FIRST
    (``reconcile_pending``): the landed-ness probe compares file
    listings, and compacting under an open intent would make the next
    probe misread a never-landed append as landed — silently dropping
    that batch's rows (ADVICE r8). The ingest loop's ordering
    (update → compact) made this safe already; direct callers now are
    too."""
    recover_interrupted_swap(spark, table)
    reconcile_pending(spark, table)
    n_buckets, bucket_cols, sort_cols = _bucket_spec(spark, table)
    old_loc = table_location(spark, table)
    tmp_table = f"{table}__compact"
    spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")
    # Repartition on the bucket columns first: a bucketed write emits
    # one file per (task, bucket) pair, and repartition's hash is the
    # same Murmur3-pmod as bucketing's, so aligning tasks to buckets
    # collapses the output to one file per non-empty bucket — which is
    # the entire point of compacting. The read-side bucketing conf is
    # disabled for the rewrite: with it on, the source table ADVERTISES
    # HashPartitioning(bucket_cols, n) and the optimizer elides the
    # repartition as redundant — while the actual scan may run
    # unbucketed ("disabled by query planner"), leaving tasks unaligned
    # and re-fragmenting the output (observed: 4 ingest generations
    # compacted to 18 files instead of 8). Write-side bucketing is
    # independent of the flag.
    prev = spark.conf.get("spark.sql.sources.bucketing.enabled")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "false")
    try:
        df = spark.table(table).repartition(
            n_buckets, *[F_col(c) for c in bucket_cols]
        )
        w = df.write.bucketBy(n_buckets, *bucket_cols)
        if sort_cols:
            w = w.sortBy(*sort_cols)
        w.option("path", new_path).mode("overwrite").saveAsTable(tmp_table)
    finally:
        spark.conf.set("spark.sql.sources.bucketing.enabled", prev)
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {tmp_table} RENAME TO {table}")
    old_fs = _local_path(old_loc)
    if old_fs is not None:
        shutil.rmtree(old_fs, ignore_errors=True)
    return table_location(spark, table)


# -- id-bloom sidecar -----------------------------------------------------
#
# The ingest loop's id-freshness guard probes the accepted batch's ids
# against the near-dup index's id column — exact, shuffle-free, but the
# ONE per-batch read whose input grows with the corpus (O(corpus×bands)
# ids per batch; ROADMAP weak spot 6). The sidecar turns that into an
# O(batch) steady state: a Bloom filter over every id ever folded, held
# in one flat file next to the marker sidecar.
#
# Correctness invariant — SUPERSET, never subset: the bloom may contain
# ids the index lacks (false positives fall back to the exact semi-join
# probe, so the guard's answers never change), but an id in the index
# must always hit the bloom (a false negative would wave a colliding
# batch through and silently double postings). The invariant holds
# because (a) the loop folds the batch's ids into the bloom BEFORE
# either index append, (b) the sidecar write is tmp + atomic rename, so
# a crash leaves either the old superset or the new one, and (c) a
# MISSING sidecar disables the fast path entirely (exact probe), so the
# delete-before-rename window degrades performance, not correctness.
#
# Sizing: the exact fallback scans the full id column, so the design
# false-positive rate must be small PER BATCH, not per id —
# bits_per_id=28/k=19 gives fpp≈1e-6, i.e. a 10k-doc batch triggers the
# fallback with p≈1%, amortizing to ~0.01 id-column scans per batch.
# Memory is 3.5 bytes/id driver-resident (1B ids → 3.5 GB: size
# ``capacity`` deliberately; beyond that, shard the loop or keep the
# exact probe). Hash positions are computed JVM-side
# (xxhash64(id, seed_i) mod m) so build/update/probe agree bit-for-bit
# and the per-batch cost stays Arrow/driver-light.
#
# Per-batch I/O is O(batch), NOT O(bitmap): bloom bits scatter
# uniformly, so rewriting the bitmap per batch would be an
# O(corpus-bits) write every batch (3.5 GB at 1B ids — the very cost
# class being removed). ``update_id_bloom`` instead appends one DELTA
# file of the batch's distinct bit positions (~8 bytes × k per id) to
# ``<sidecar>_deltas/``, content-addressed by the position set's
# digest — a replayed batch re-publishes the SAME file name, so
# at-least-once delivery cannot grow the log. Readers overlay deltas
# onto the in-memory bitmap at load; ``fold_id_bloom`` (called by the
# ingest sweep past BLOOM_MAX_DELTAS files) rewrites the base with the
# deltas applied and then deletes them — crash between the two steps
# re-applies deltas already in the base, which is idempotent bit-OR.
# Every delta carries (k, m) in its header; a delta whose geometry
# disagrees with the base (a leftover from before a rebuild at
# different sizing) is skipped on read and deleted at fold — the
# rebuild derived its bitmap from ALL ids, so dropping stale deltas
# preserves the superset invariant.

_BLOOM_MAGIC = b"PFBLOOM1"
_BLOOM_DELTA_MAGIC = b"PFBLMD01"
_BLOOM_SUFFIX = "_idbloom"
# path → (sig, (k, m, n_added, bitmap)) — reread only when the base
# file or the delta listing changes; the single-writer loop makes this
# safe, and readers in other processes see rename-published files.
_BLOOM_CACHE: dict = {}
# Fold the delta log into the base bitmap past this many files (the
# ingest sweep calls fold_id_bloom alongside index compaction).
BLOOM_MAX_DELTAS = 64


def _bloom_path(spark, table: str) -> str:
    return f"{_sidecar_base(spark, table)}{_BLOOM_SUFFIX}"


def _bloom_stat(spark, path: str):
    """(size, mtime) or None — the cache key, checked BEFORE reading
    the (possibly many-MB) bitmap."""
    import os

    lp = _local_path(path)
    if lp is not None:
        try:
            st = os.stat(lp)
        except FileNotFoundError:
            return None
        return st.st_size, st.st_mtime_ns
    fs, p = _marker_fs(spark, path)
    if not fs.exists(p):
        return None
    st = fs.getFileStatus(p)
    return st.getLen(), st.getModificationTime()


def _bloom_read_bytes(spark, path: str) -> bytes:
    """Slurp the sidecar. Local fast path; Hadoop FS for hdfs:/s3a:
    (commons-io — the file is MBs and mtime-cached by the caller)."""
    lp = _local_path(path)
    if lp is not None:
        with open(lp, "rb") as f:
            return f.read()
    fs, p = _marker_fs(spark, path)
    stream = fs.open(p)
    try:
        return bytes(
            spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()


def _bloom_write_atomic(
    spark, path: str, data: bytes, if_absent: bool = False
) -> None:
    """Publish via tmp + rename: a reader sees the old file or the new
    one, never a torn write. (Local rename replaces atomically; Hadoop
    rename won't overwrite, so the old file is deleted first — for the
    BASE bitmap the uncovered instant has NO sidecar, which reads as
    'exact probe mode', not as a stale subset.)

    ``if_absent=True`` (content-addressed delta publishes) skips the
    write entirely when the target exists — the name is a digest of the
    content, so the existing file IS the payload. This matters on the
    Hadoop arm: delete-then-rename of a LIVE delta during a replay
    re-publish would, on a crash between the two steps, remove a delta
    the base still needs — a bloom SUBSET, the one state the superset
    invariant forbids and nothing downstream can repair."""
    import os

    lp = _local_path(path)
    if lp is not None:
        if if_absent and os.path.exists(lp):
            return
        tmp = f"{lp}.tmp"
        os.makedirs(os.path.dirname(lp), exist_ok=True)
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, lp)
        return
    fs, p = _marker_fs(spark, path)
    if if_absent and fs.exists(p):
        return
    tmp_p = spark._jvm.org.apache.hadoop.fs.Path(f"{path}.tmp")
    out = fs.create(tmp_p, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()
    if not if_absent:
        fs.delete(p, False)
    if not fs.rename(tmp_p, p):
        raise IOError(f"rename {tmp_p} -> {p} failed")


def _bloom_encode(k: int, m: int, n_added: int, bitmap) -> bytes:
    import struct

    return (
        _BLOOM_MAGIC
        + struct.pack("<IIQQ", 1, k, m, n_added)
        + bitmap.tobytes()
    )


def _bloom_decode(data: bytes):
    import struct

    import numpy as np

    if data[:8] != _BLOOM_MAGIC:
        raise ValueError("not an id-bloom sidecar")
    _ver, k, m, n_added = struct.unpack("<IIQQ", data[8:32])
    bitmap = np.frombuffer(data[32:], dtype=np.uint8).copy()
    if len(bitmap) != m // 8:
        raise ValueError(f"id-bloom bitmap truncated: {len(bitmap)} != {m // 8}")
    return k, m, n_added, bitmap


def _bloom_delta_dir(path: str) -> str:
    return f"{path}_deltas"


def _list_bloom_deltas(spark, path: str) -> list[tuple[str, int]]:
    """(delta path, size) under the sidecar's delta dir — O(#deltas),
    bounded by the fold cadence. Names ending in ``.tmp`` are the
    in-flight halves of ``_bloom_write_atomic``'s tmp+rename — a crash
    between the write and the rename leaves one behind, and treating it
    as a delta would make every subsequent ``_load_bloom`` raise on its
    torn bytes, wedging the ingest loop. They are skipped here
    (published deltas only) and reaped by ``fold_id_bloom``."""
    import os

    ddir = _bloom_delta_dir(path)
    lp = _local_path(ddir)
    if lp is not None:
        try:
            names = sorted(os.listdir(lp))
        except FileNotFoundError:
            return []
        out = []
        for n in names:
            if n.startswith("delta-") and not n.endswith(".tmp"):
                full = os.path.join(lp, n)
                out.append((full, os.stat(full).st_size))
        return out
    fs, p = _marker_fs(spark, ddir)
    if not fs.exists(p):
        return []
    return sorted(
        (s.getPath().toString(), s.getLen())
        for s in fs.listStatus(p)
        if s.getPath().getName().startswith("delta-")
        and not s.getPath().getName().endswith(".tmp")
    )


def _reap_stale_bloom_tmps(spark, path: str) -> int:
    """Delete crash-leftover ``*.tmp`` files under the delta dir.
    Safe at a fold point: the single-writer loop means no delta write
    is in flight, so any ``.tmp`` present is an orphan."""
    import os

    ddir = _bloom_delta_dir(path)
    reaped = 0
    lp = _local_path(ddir)
    if lp is not None:
        try:
            names = os.listdir(lp)
        except FileNotFoundError:
            return 0
        for n in names:
            if n.endswith(".tmp"):
                try:
                    os.remove(os.path.join(lp, n))
                    reaped += 1
                except FileNotFoundError:
                    pass
        return reaped
    fs, p = _marker_fs(spark, ddir)
    if not fs.exists(p):
        return 0
    for s in fs.listStatus(p):
        if s.getPath().getName().endswith(".tmp"):
            fs.delete(s.getPath(), False)
            reaped += 1
    return reaped


def _delete_bloom_deltas(spark, deltas: list[tuple[str, int]]) -> None:
    import os

    for dpath, _sz in deltas:
        lp = _local_path(dpath)
        if lp is not None:
            try:
                os.remove(lp)
            except FileNotFoundError:
                pass
        else:
            fs, p = _marker_fs(spark, dpath)
            fs.delete(p, False)


def _bloom_delta_encode(k: int, m: int, positions) -> bytes:
    import struct

    import numpy as np

    arr = np.asarray(sorted(set(int(p) for p in positions)), dtype="<i8")
    return (
        _BLOOM_DELTA_MAGIC
        + struct.pack("<IIQQ", 1, k, m, len(arr))
        + arr.tobytes()
    )


def _bloom_delta_decode(data: bytes):
    """(k, m, positions) — raises on a foreign file."""
    import struct

    import numpy as np

    if data[:8] != _BLOOM_DELTA_MAGIC:
        raise ValueError("not an id-bloom delta")
    _ver, k, m, n = struct.unpack("<IIQQ", data[8:32])
    pos = np.frombuffer(data[32:], dtype="<i8")
    if len(pos) != n:
        raise ValueError("id-bloom delta truncated")
    return k, m, pos


def _load_bloom(spark, table: str):
    """(k, m, n_added, bitmap-with-deltas-applied) or None, via a
    cache keyed on (base file stat, delta listing) — a probe on an
    unchanged sidecar costs one stat + one dir listing, no bitmap
    read. Deltas whose (k, m) disagree with the base are leftovers
    from before a rebuild at different sizing and are skipped (the
    rebuild covered all ids). A concurrent rename-publish between the
    stat and the read just caches the newer superset under the older
    key; the next call self-corrects."""
    path = _bloom_path(spark, table)
    base_sig = _bloom_stat(spark, path)
    if base_sig is None:
        _BLOOM_CACHE.pop(path, None)
        return None
    deltas = _list_bloom_deltas(spark, path)
    sig = (base_sig, tuple(deltas))
    hit = _BLOOM_CACHE.get(path)
    if hit is not None and hit[0] == sig:
        return hit[1]
    k, m, n_added, bitmap = _bloom_decode(_bloom_read_bytes(spark, path))
    for dpath, _sz in deltas:
        dk, dm, pos = _bloom_delta_decode(_bloom_read_bytes(spark, dpath))
        if (dk, dm) != (k, m):
            continue
        _set_bits(bitmap, pos)
        n_added += max(1, len(pos) // max(k, 1))
    parsed = (k, m, n_added, bitmap)
    _BLOOM_CACHE[path] = (sig, parsed)
    return parsed


def _bloom_pos_array(id_col: str, k: int, m: int):
    """array<long> of the id's k bit positions, all JVM-side."""
    from pyspark.sql import functions as F

    return F.array(*[
        F.pmod(F.xxhash64(F.col(id_col), F.lit(i)), F.lit(m))
        for i in range(k)
    ])


def _set_bits(bitmap, positions) -> None:
    import numpy as np

    pos = np.asarray(positions, dtype=np.int64)
    np.bitwise_or.at(
        bitmap, pos >> 3, np.left_shift(1, (pos & 7)).astype(np.uint8)
    )


def build_id_bloom(
    spark,
    table: str,
    ids_df=None,
    id_col: str = "doc_id",
    capacity: int | None = None,
    bits_per_id: int = 28,
    k: int = 19,
) -> dict:
    """Build (or REBUILD — e.g. when ``id_bloom_stats`` reports
    saturation) the id-bloom sidecar for ``table`` from ``ids_df``
    (default: the index's own id column — duplicates are free, only
    distinct bit positions matter). ``capacity`` defaults to 2× the
    current distinct-id count, so the steady-state loop has headroom
    before the next rebuild; the build is one shuffle of k×n position
    rows (the same cost class as building the index itself) and the
    driver receives exactly m/8 bitmap bytes regardless of corpus size
    — each 8-Mbit chunk of the bitmap is assembled executor-side by
    ``applyInPandas`` over its chunk's positions.

    Opt-in: the ingest guard uses the sidecar only if this was called;
    without it the exact probe runs unconditionally. Creates
    ``<table>_meta`` if absent so the sidecar anchor can never move
    under a later compaction. Returns ``id_bloom_stats``."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    if not spark.catalog.tableExists(f"{table}_meta") and not (
        spark.catalog.tableExists(f"{table}_stats")
    ):
        write_index_meta(spark, table, [], None)
    ids = (
        ids_df if ids_df is not None
        else spark.table(table).select(id_col)
    )
    n_ids = ids.select(id_col).distinct().count()
    if capacity is None:
        capacity = 2 * n_ids
    m = max(1024, int(math.ceil(bits_per_id * max(capacity, 1) / 64.0)) * 64)
    chunk_bits = min(m, 1 << 23)  # ≤ 1 MiB of bitmap per Arrow group
    # round m UP to a whole number of chunks: the assembly below copies
    # fixed chunk-sized slices, and a ragged last chunk would overrun
    # the bitmap (extra bits only widen the filter slightly)
    m = int(math.ceil(m / float(chunk_bits))) * chunk_bits

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        c = int(pdf["_c"].iloc[0])
        local = pdf["_p"].to_numpy(dtype=np.int64) - c * chunk_bits
        bits = np.zeros(chunk_bits // 8, dtype=np.uint8)
        _set_bits(bits, local)
        return pd.DataFrame({"c": [c], "bits": [bits.tobytes()]})

    chunks = (
        ids.select(F.explode(_bloom_pos_array(id_col, k, m)).alias("_p"))
        .withColumn("_c", (F.col("_p") / chunk_bits).cast("long"))
        .groupBy("_c")
        .applyInPandas(pack, "c long, bits binary")
        .collect()
    )
    bitmap = np.zeros(m // 8, dtype=np.uint8)
    step = chunk_bits // 8
    for r in chunks:
        bitmap[r["c"] * step:(r["c"] + 1) * step] = np.frombuffer(
            r["bits"], dtype=np.uint8
        )
    path = _bloom_path(spark, table)
    # n_added records ids actually inserted (capacity only sized m) —
    # id_bloom_stats' n_added_est would otherwise overstate 2× from the
    # first report and mislead the saturation runbook.
    _bloom_write_atomic(spark, path, _bloom_encode(k, m, n_ids, bitmap))
    # Clear the delta log ONLY AFTER the new base landed: the base was
    # derived from all ids, so the deltas are redundant once it exists
    # — but deleting them first would leave the OLD base without its
    # deltas on a crash, a subset, which nothing could repair.
    _delete_bloom_deltas(spark, _list_bloom_deltas(spark, path))
    return id_bloom_stats(spark, table)


def update_id_bloom(spark, table: str, ids_df, id_col: str = "doc_id") -> bool:
    """Fold a BATCH's ids into the sidecar (idempotent — replays
    republish the same content-addressed delta file). No-op (False)
    when no sidecar exists. Must run BEFORE the batch's index folds:
    the crash window then leaves the bloom a superset of the index,
    which the exact fallback absorbs; the reverse order could leave it
    a subset, which nothing could.

    O(batch) on disk: writes one delta file of the batch's distinct
    bit positions — never the bitmap, whose bytes are corpus-sized and
    whose dirty bits scatter uniformly (no partial rewrite exists).

    Bounded collect: the driver materializes ≤ k×|batch| longs
    (~150 bytes/id transient) — the same cost class as the guard's
    pre-existing ``F.broadcast(batch ids)`` in the exact probe, i.e.
    the loop's batch-sized-driver-work contract, NOT a corpus scan.
    Multi-million-doc feeds should shard the batch upstream (the
    ingest loop's other per-batch costs assume that too)."""
    import hashlib

    from pyspark.sql import functions as F

    loaded = _load_bloom(spark, table)
    if loaded is None:
        return False
    k, m, _n, _bitmap = loaded
    rows = (
        ids_df.select(F.explode(_bloom_pos_array(id_col, k, m)).alias("_p"))
        .distinct()
        .collect()
    )
    if not rows:
        return True
    data = _bloom_delta_encode(k, m, [r["_p"] for r in rows])
    name = f"delta-{hashlib.md5(data).hexdigest()}"
    _bloom_write_atomic(
        spark,
        f"{_bloom_delta_dir(_bloom_path(spark, table))}/{name}",
        data,
        if_absent=True,
    )
    return True


def fold_id_bloom(
    spark, table: str, max_deltas: int | None = None
) -> bool:
    """Rewrite the base bitmap with the delta log applied and delete
    the folded deltas — the sidecar's compaction, called by the ingest
    sweep when the delta count crosses ``max_deltas`` (pass 0 to force
    it). The one O(bitmap-bytes) write, amortized over ``max_deltas``
    batches. Crash-safe in both windows: before the base rename the
    old base + deltas still answer; between the rename and the
    deletes, re-applying a folded delta is idempotent bit-OR. Stale
    different-geometry deltas (pre-rebuild leftovers) are deleted
    unread. Returns True iff it folded. ``max_deltas`` defaults to the
    CURRENT ``BLOOM_MAX_DELTAS`` (resolved at call time, so tests and
    deployments can tune the module knob)."""
    if max_deltas is None:
        max_deltas = BLOOM_MAX_DELTAS
    path = _bloom_path(spark, table)
    if _bloom_stat(spark, path) is None:
        return False
    _reap_stale_bloom_tmps(spark, path)
    folding = _list_bloom_deltas(spark, path)
    if len(folding) <= max_deltas:
        return False
    loaded = _load_bloom(spark, table)  # base + exactly these deltas
    k, m, n_added, bitmap = loaded
    _bloom_write_atomic(spark, path, _bloom_encode(k, m, n_added, bitmap))
    _delete_bloom_deltas(spark, folding)
    return True


def _exact_id_probe(spark, table: str, ids_df, id_col: str, limit: int):
    """The authoritative collision check: ids that EXIST in the index's
    id column — a broadcast semi-join against the column-pruned id
    column (no shuffle, no signature/text read, O(corpus×bands) input)."""
    from pyspark.sql import functions as F

    return [
        r[id_col]
        for r in spark.table(table)
        .select(id_col)
        .join(F.broadcast(ids_df.select(id_col)), id_col, "semi")
        # the index keeps one row per (band, id): distinct AFTER the
        # semi-join — its output is collisions only (normally empty),
        # so the distinct never shuffles more than the clash set
        .distinct()
        .limit(limit)
        .collect()
    ]


def probe_id_collisions(
    spark, table: str, ids_df, id_col: str = "doc_id", limit: int = 5
) -> list:
    """Ids from ``ids_df`` already present in index ``table`` (≤
    ``limit``, for the error message). With an id-bloom sidecar the
    steady state is O(batch): positions compute JVM-side, the batch's
    ids check against the driver-resident bitmap, and only ids whose k
    bits are ALL set (a real collision, or a ~1e-6 false positive) fall
    back to ``_exact_id_probe`` — restricted to the suspicious ids, so
    a clean batch reads zero index rows. Without a sidecar every call
    is the exact probe (the pre-r8 behavior).

    Bounded collect: ≤ k×|batch| positions land on the driver — the
    batch-sized contract shared with ``update_id_bloom`` (see its
    docstring); membership must be checked where the bitmap lives, and
    re-broadcasting a multi-GB bitmap per batch (its signature changes
    with every delta) would cost more than it saves."""
    loaded = _load_bloom(spark, table)
    if loaded is None:
        return _exact_id_probe(spark, table, ids_df, id_col, limit)
    k, m, _n, bitmap = loaded
    from pyspark.sql import functions as F

    rows = ids_df.select(
        F.col(id_col), _bloom_pos_array(id_col, k, m).alias("_pos")
    ).collect()
    suspicious = [
        r[id_col]
        for r in rows
        if all((int(bitmap[p >> 3]) >> (p & 7)) & 1 for p in r["_pos"])
    ]
    if not suspicious:
        return []
    sus_df = spark.createDataFrame(
        [(s,) for s in suspicious], ids_df.select(id_col).schema
    )
    return _exact_id_probe(spark, table, sus_df, id_col, limit)


def id_bloom_stats(spark, table: str) -> dict | None:
    """Saturation signal: ``est_fpp`` is fill_ratio**k (the probability
    a fresh id hits all k bits). Runbook: when est_fpp drifts past
    ~1e-4 — i.e. the exact fallback starts firing on a meaningful
    fraction of batches — rebuild with a larger capacity via
    ``build_id_bloom`` at a quiet point (the rebuild is one corpus-
    sized shuffle, the same amortized class as ``compact_index``).
    None when no sidecar exists."""
    import numpy as np

    loaded = _load_bloom(spark, table)
    if loaded is None:
        return None
    k, m, n_added, bitmap = loaded
    ones = 0
    step = 1 << 22
    for i in range(0, len(bitmap), step):
        ones += int(np.unpackbits(bitmap[i:i + step]).sum())
    fill = ones / float(m)
    return {
        "k": k,
        "m_bits": m,
        "n_added_est": n_added,
        "fill_ratio": fill,
        "est_fpp": fill ** k,
    }


def needs_bloom_rebuild(spark, table: str, max_fpp: float = 1e-4) -> bool:
    """True when the sidecar exists and its estimated false-positive
    rate exceeds ``max_fpp`` (signal only — the rebuild is corpus-sized
    and belongs at a quiet point, not inside a batch)."""
    stats = id_bloom_stats(spark, table)
    return stats is not None and stats["est_fpp"] > max_fpp
