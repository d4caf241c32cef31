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


def _marker_dir(spark, table: str) -> str:
    meta_t, stats_t = f"{table}_meta", f"{table}_stats"
    if spark.catalog.tableExists(meta_t):
        base = table_location(spark, meta_t)
    elif spark.catalog.tableExists(stats_t):
        base = table_location(spark, stats_t)
    else:
        base = f"{table_location(spark, table)}_meta"
    return f"{base}_markers"


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
    ran."""
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
