#!/usr/bin/env python
"""Measure the mirror's wholesale arms (r7): the DISTRIBUTED
checkpoint rebuild vs the driver-dict fallback at the same catalog
size, and a size-triggered bucket-count migration. One JSON line;
results land in BASELINE.md.

Usage: [BENCH_INODES=200000] python tools/bench_mirror_rebuild.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pufs_spark.catalog import commitlog as CL  # noqa: E402
from pufs_spark.catalog.datastore import ROOT_INODE  # noqa: E402
from pufs_spark.session import get_spark  # noqa: E402
from pufs_spark.sources.datasource import (  # noqa: E402
    CDC_SCHEMA,
    PufsCommitsStreamReader,
)
from pufs_spark.streaming import mirror as M  # noqa: E402

N_INODES = int(os.environ.get("BENCH_INODES", "200000"))


def main() -> None:
    spark = get_spark(app_name="bench_mirror_rebuild")
    out: dict = {"inodes": N_INODES}
    fields = [c.split()[0] for c in CDC_SCHEMA.split(", ")]
    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "cat")
        n_top = max(8, int(N_INODES ** 0.5 // 2))
        n_files = max(1, N_INODES // n_top - 1)
        t0 = time.monotonic()
        w, log = CL.open_log(root)
        for i in range(n_top):
            d = w.mkdir(ROOT_INODE, f"dir{i:05d}")
            for j in range(n_files):
                w.add_immutable_bytes(d, f"f{j:05d}", b"x" * 16)
        log.commit(w)
        out["build_s"] = round(time.monotonic() - t0, 2)

        rdr = PufsCommitsStreamReader({"root": root})
        rows = [
            dict(zip(fields, t))
            for t in rdr.readBetweenOffsets({"version": 0}, {"version": 1})
        ]

        # distributed checkpoint rebuild (the production arm)
        mdir_d = os.path.join(tmp, "mirror_dist")
        t0 = time.monotonic()
        M._fold_rows(root, mdir_d, rows, spark=spark)
        out["checkpoint_rebuild_distributed_s"] = round(
            time.monotonic() - t0, 2
        )

        # driver-dict fallback at the same size (the r6 ceiling) —
        # skipped past 1M inodes: it is O(catalog) driver memory BY
        # DESIGN (test-only arm) and the 200k point already bounds it
        if N_INODES <= 1_000_000:
            mdir_p = os.path.join(tmp, "mirror_py")
            t0 = time.monotonic()
            M._fold_rows(root, mdir_p, rows, spark=None)
            out["checkpoint_rebuild_driver_dict_s"] = round(
                time.monotonic() - t0, 2
            )

        # re-bucket migrations up to the MAX_BUCKETS=4096 ceiling
        # (each is a wholesale executor rewrite at growth=4): at 10M
        # inodes this exercises every step 64 -> 256 -> 1024 -> 4096
        out["rebucket_steps"] = []
        while True:
            t0 = time.monotonic()
            new_n = M.maybe_rebucket(spark, mdir_d, max_bucket_bytes=1)
            if new_n is None:
                break
            out["rebucket_steps"].append(
                {"to": new_n, "s": round(time.monotonic() - t0, 2)}
            )
        out["final_buckets"] = M._resolve_state(str(mdir_d))[2]

        # a 1-path delta at the migrated count (the steady-state cost)
        t0p = w.resolve_path("/dir00000")
        w.add_immutable_bytes(t0p, "after", b"y")
        log.commit(w)
        rows2 = [
            dict(zip(fields, t))
            for t in rdr.readBetweenOffsets({"version": 1}, {"version": 2})
        ]
        t0 = time.monotonic()
        M._fold_rows(root, mdir_d, rows2, spark=spark)
        out["delta_fold_after_rebucket_s"] = round(time.monotonic() - t0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
