#!/usr/bin/env python
"""Measure the reference's four benchmark-harness workload shapes
(SURVEY §6 / BASELINE.md) on this engine and print one JSON report.

Workloads (reference sources in BASELINE.md):
1. read-1m / read-50m analog — cold ensure_cached + read of a 1MB and
   50MB block at the reference's 200KB chunk size, then warm re-read
   (must fetch zero remote bytes).
2. walktree analog — 500 dirs x 1 file x 4KB: push on store A, mount
   on fresh store B, os.walk-style traversal pass 1 (cold: lazy
   manifest expansion per dir) vs pass 2 (cached).
3. freeze+push — Merkle snapshot + publish of the same dirty tree.
4. stress analog — 3 threads x 5s of random reads <= 3MB against the
   cached 50MB block, byte-compared against the source of truth.
5. L3 extended-listing p50 over 20 warm runs at $SPARK_GRAFT_SF_DIR.

Usage: python tools/baseline_workloads.py
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pufs_spark.catalog.datastore import ROOT_INODE, DataStore  # noqa: E402
from pufs_spark.session import get_spark  # noqa: E402
from pufs_spark.sources import sparse  # noqa: E402
from pufs_spark.sources.remote import LocalDirRemote  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CHUNK = 200 * 1024


def bench_reads(spark, tmp: str) -> dict:
    out = {}
    remote_dir = os.path.join(tmp, "remote_reads")
    remote = LocalDirRemote(remote_dir)
    rnd = random.Random(7)
    blocks = {
        "blk_1m": bytes(rnd.getrandbits(8) for _ in range(1 << 20)),
        "blk_50m": os.urandom(50 << 20),
    }
    for bid, data in blocks.items():
        remote.put_block_if_absent(bid, data)
    cache = os.path.join(tmp, "cache_reads")

    def factory():
        return LocalDirRemote(remote_dir)

    # warm up the session's python-worker/RDD machinery on a scratch
    # block so the 1MB cold number measures the engine, not first-job
    # JVM/worker spin-up
    remote.put_block_if_absent("blk_warm", b"w" * 1024)
    sparse.read_through(
        spark, cache, factory, "blk_warm", 0, 1024, chunk_size=CHUNK, readahead=0
    )

    for label, bid, nbytes in (("1mb", "blk_1m", 1 << 20), ("50mb", "blk_50m", 50 << 20)):
        t0 = time.monotonic()
        got = sparse.read_through(
            spark, cache, factory, bid, 0, nbytes, chunk_size=CHUNK, readahead=0
        )
        cold = time.monotonic() - t0
        assert got == blocks[bid], f"{label}: byte mismatch"
        t0 = time.monotonic()
        stats = sparse.ensure_cached(
            spark, cache, factory,
            spark.createDataFrame([(bid, 0, nbytes)], "bid string, qstart long, qend long"),
            chunk_size=CHUNK,
        )
        fz = sparse.SparseFreezer(cache)
        warm_bytes = fz.read(bid, 0, nbytes)
        warm = time.monotonic() - t0
        assert stats["bytes_fetched"] == 0 and warm_bytes == blocks[bid]
        out[f"cold_{label}_read_s"] = round(cold, 3)
        out[f"warm_{label}_read_s"] = round(warm, 3)
    return out, cache, blocks


def build_widetree(store: DataStore, n_dirs: int = 500) -> None:
    payload = b"x" * 4096
    for i in range(n_dirs):
        d = store.mkdir(ROOT_INODE, f"dir{i:04d}")
        store.add_immutable_bytes(d, "file.dat", payload)


def bench_walktree(tmp: str) -> dict:
    remote = LocalDirRemote(os.path.join(tmp, "remote_tree"))
    a = DataStore(os.path.join(tmp, "store_a"), remote=remote)
    build_widetree(a)
    t0 = time.monotonic()
    a.freeze()
    freeze_s = time.monotonic() - t0
    t0 = time.monotonic()
    a.push("widetree")
    push_s = time.monotonic() - t0

    b = DataStore(os.path.join(tmp, "store_b"), remote=remote)
    mnt = b.mount_by_label(ROOT_INODE, "tree", "widetree")

    def walk(ds: DataStore, inode: int) -> int:
        n = 0
        for name, child in ds.get_dir_contents(inode):
            node = ds.get_node(child)
            n += 1
            if node.is_dir:
                n += walk(ds, child)
            else:
                ds.read(child, 0, 4000)  # reference reads at 4000-byte granularity
        return n

    t0 = time.monotonic()
    n1 = walk(b, mnt)
    cold = time.monotonic() - t0
    assert n1 > 500, f"walk saw {n1} entries"  # reference asserts >500
    t0 = time.monotonic()
    n2 = walk(b, mnt)
    warm = time.monotonic() - t0
    assert n2 == n1
    return {
        "freeze_500x4kb_s": round(freeze_s, 3),
        "push_500x4kb_s": round(push_s, 3),
        "walktree_cold_s": round(cold, 3),
        "walktree_warm_s": round(warm, 3),
        "walktree_entries": n1,
    }


def bench_stress(cache: str, blocks: dict, seconds: float = 5.0, n_threads: int = 3) -> dict:
    fz = sparse.SparseFreezer(cache)
    truth = blocks["blk_50m"]
    nbytes = len(truth)
    stop = time.monotonic() + seconds
    totals = [0] * n_threads
    errors: list[str] = []

    def worker(i: int) -> None:
        rnd = random.Random(1000 + i)
        while time.monotonic() < stop:
            ln = min(int(2 ** rnd.uniform(10, 21.58)), 3 << 20)  # log-uniform <= 3MB
            off = rnd.randrange(0, nbytes - ln)
            got = fz.read("blk_50m", off, ln)
            if got != truth[off : off + ln]:
                errors.append(f"mismatch at {off}+{ln}")
                return
            totals[i] += ln

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.monotonic() - t0
    assert not errors, errors[:3]
    return {
        "stress_threads": n_threads,
        "stress_seconds": round(elapsed, 2),
        "stress_bytes_compared": sum(totals),
        "stress_mb_per_s": round(sum(totals) / elapsed / (1 << 20), 1),
    }


def bench_incremental_freeze(spark) -> dict:
    """Memoized (dirty-bit) freeze cost must track the dirty spine, not
    tree size: dirty 1% of files + their ancestor dirs, refreeze."""
    from pyspark.sql import functions as F

    from pufs_spark.plans import fstree, merkle

    nodes = fstree.fs_nodes(spark, SF_DIR)
    t0 = time.monotonic()
    full = merkle.freeze_nodes_df(nodes).localCheckpoint()
    full_s = time.monotonic() - t0

    # dirty 1%: change those files' bids, null their ancestor dir bids
    dirty_files = F.col("inode") % 100 == 0
    dirty_parents = (
        full.where(~F.col("is_dir") & dirty_files).select("parent").distinct()
    )
    anc = dirty_parents.withColumnRenamed("parent", "inode")
    frontier = anc
    for _ in range(8):
        frontier = (
            full.join(
                frontier.withColumnRenamed("inode", "_c"),
                F.col("inode") == F.col("_c"),
            )
            .select(F.col("parent").alias("inode"))
            .distinct()
        )
        anc = anc.unionByName(frontier).distinct().localCheckpoint()
        if frontier.where(F.col("inode") != 1).isEmpty():
            break
    dirty_set = {r["inode"] for r in anc.collect()}
    patched = full.withColumn(
        "bid",
        F.when(~F.col("is_dir") & dirty_files, F.concat(F.col("bid"), F.lit("_v2")))
        .when(F.col("inode").isin(dirty_set), F.lit(None))
        .otherwise(F.col("bid")),
    ).localCheckpoint()
    t0 = time.monotonic()
    merkle.freeze_nodes_df(patched, memoized=True).write.format("noop").mode(
        "overwrite"
    ).save()
    incr_s = time.monotonic() - t0
    return {
        "full_freeze_s": round(full_s, 3),
        "incremental_freeze_1pct_s": round(incr_s, 3),
        "dirty_dirs": len(dirty_set),
    }


def bench_l3(spark) -> dict:
    import __spark_entry__ as entrymod

    q = entrymod.queries()["L3_extended_listing"]
    q(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
    times = []
    for _ in range(20):
        t0 = time.monotonic()
        q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times.append(time.monotonic() - t0)
    times.sort()
    return {
        "l3_p50_s": round(times[len(times) // 2], 3),
        "l3_p90_s": round(times[int(len(times) * 0.9)], 3),
    }


def main() -> None:
    spark = get_spark(app_name="baseline_workloads")
    report: dict = {"sf_dir": SF_DIR, "chunk_size": CHUNK}
    with tempfile.TemporaryDirectory() as tmp:
        reads, cache, blocks = bench_reads(spark, tmp)
        report.update(reads)
        report.update(bench_walktree(tmp))
        report.update(bench_stress(cache, blocks))
        report.update(bench_incremental_freeze(spark))
        report.update(bench_l3(spark))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
