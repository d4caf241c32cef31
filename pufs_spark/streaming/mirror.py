"""Live catalog mirror: a streaming materialized view over the commit
log. The `pufs_commits` CDC source (sources/datasource.py) emits
per-path changes; this consumer folds them into a continuously-updated
parquet of the catalog's CURRENT state (path, is_dir, size, bid) that
any reader — Spark, DuckDB, pyarrow — can scan without touching the
commit log. The streaming analog of ``commitlog.materialize``: instead
of reconstructing a version on demand, the mirror is maintained as
versions land.

Consistency model: the mirror is updated atomically (temp + rename)
once per micro-batch, tagged with the last applied version. Folding is
idempotent — upserts overwrite by path, checkpoint markers rebuild
wholesale — so foreachBatch's at-least-once replay after a failure
converges to the same state; combined with the CDC source's
exactly-once version ranges, the mirror equals
``materialize(last_version)`` at every rest point (pinned by test).

Scale: per-batch work is O(changed paths) driver-side (the CDC feed is
a metadata stream); only a checkpoint marker pays a catalog-sized
rebuild, which is exactly the cost profile of the commit log itself
(deltas cheap, checkpoints anchoring)."""

from __future__ import annotations

import json
import os

from pufs_spark.catalog.commitlog import CommitLog
from pufs_spark.catalog.datastore import DataStore

MIRROR_FILE = "mirror.parquet"
META_FILE = "mirror_meta.json"


def _load_state(mirror_dir: str) -> tuple[dict, int]:
    """path → (is_dir, size, bid), plus the last applied version."""
    import pyarrow.parquet as pq

    f = os.path.join(mirror_dir, MIRROR_FILE)
    meta = os.path.join(mirror_dir, META_FILE)
    if not os.path.exists(f):
        return {}, -1
    t = pq.read_table(f)
    state = {
        p: (d, s, b)
        for p, d, s, b in zip(
            t["path"].to_pylist(),
            t["is_dir"].to_pylist(),
            t["size"].to_pylist(),
            t["bid"].to_pylist(),
        )
    }
    version = -1
    if os.path.exists(meta):
        version = json.load(open(meta)).get("version", -1)
    return state, version


def _save_state(mirror_dir: str, state: dict, version: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(mirror_dir, exist_ok=True)
    paths = sorted(state)
    table = pa.table(
        {
            "path": paths,
            "is_dir": [state[p][0] for p in paths],
            "size": pa.array([state[p][1] for p in paths], pa.int64()),
            "bid": [state[p][2] for p in paths],
        }
    )
    tmp = os.path.join(mirror_dir, MIRROR_FILE + f".tmp.{os.getpid()}")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(mirror_dir, MIRROR_FILE))
    mtmp = os.path.join(mirror_dir, META_FILE + f".tmp.{os.getpid()}")
    with open(mtmp, "w") as f:
        json.dump({"version": version}, f)
    os.replace(mtmp, os.path.join(mirror_dir, META_FILE))


def _rebuild_state(root: str, version: int) -> dict:
    """Wholesale state at ``version`` via materialize + export (the
    checkpoint-marker path; expand=False — the mirror reflects the
    catalog AS COMMITTED, deferred subtrees stay deferred)."""
    import tempfile

    import pyarrow.parquet as pq

    log = CommitLog(root)
    store = DataStore.load(root, catalog_file=log.materialize(version))
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "cat.parquet")
        store.export_catalog(out, expand=False)
        t = pq.read_table(out, columns=["path", "is_dir", "size", "bid"])
        return {
            p: (d, s, b)
            for p, d, s, b in zip(
                t["path"].to_pylist(),
                t["is_dir"].to_pylist(),
                t["size"].to_pylist(),
                t["bid"].to_pylist(),
            )
        }


def _fold_rows(root: str, mirror_dir: str, rows: list) -> None:
    """Apply one micro-batch of CDC rows (any number of versions) to
    the mirror. Idempotent: versions ≤ the mirror's applied version
    re-apply harmlessly (upserts overwrite, rebuilds rebuild)."""
    if not rows:
        return
    state, _ = _load_state(mirror_dir)
    by_version: dict[int, list] = {}
    for r in rows:
        by_version.setdefault(r["version"], []).append(r)
    last = -1
    for v in sorted(by_version):
        batch = by_version[v]
        if any(r["change"] == "checkpoint" for r in batch):
            state = _rebuild_state(root, v)
        else:
            for r in batch:
                if r["change"] == "upsert":
                    state[r["path"]] = (r["is_dir"], r["size"], r["bid"])
            for r in batch:
                if r["change"] == "absent":
                    gone = r["path"]
                    for p in list(state):
                        if p == gone or p.startswith(gone + "/"):
                            del state[p]
        last = v
    _save_state(mirror_dir, state, last)


def start_catalog_mirror(
    spark,
    root: str,
    mirror_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (and return) the streaming query maintaining the mirror.
    ``available_now=True`` drains the log and stops (batch-style
    refresh); ``False`` runs continuously. The `pufs_commits` source is
    registered idempotently."""
    from pufs_spark.sources.datasource import PufsCommitsDataSource

    try:
        spark.dataSource.register(PufsCommitsDataSource)
    except Exception:  # noqa: BLE001 — already registered
        pass

    cdc = spark.readStream.format("pufs_commits").option("root", root).load()

    def fold(batch_df, _batch_id):
        _fold_rows(root, mirror_dir, batch_df.collect())

    writer = (
        cdc.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_mirror(spark, mirror_dir: str):
    """The mirror as a DataFrame (path, is_dir, size, bid)."""
    return spark.read.parquet(os.path.join(mirror_dir, MIRROR_FILE))
