"""Measure the ingest id-freshness guard's two probe paths against the
same near-dup index: the exact index-column semi-join (input grows
with the corpus — ROADMAP weak spot 6) vs the id-bloom sidecar
(O(batch): positions JVM-side, membership against the driver-resident
bitmap, zero index rows read on a clean batch).

Run at two SF dirs (sf0.1, then the gen_scale.py sf1.0 tile) to get
the scaling story: exact-probe wall should grow with the corpus, bloom
wall should stay flat. One JSON line; numbers land in BASELINE.md.

Usage: [SPARK_GRAFT_SF_DIR=...] [PROBE_BATCH=1000] python tools/bench_idprobe.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pufs_spark.operators import dedup, indexes  # noqa: E402
from pufs_spark.session import get_spark  # noqa: E402
from pufs_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCH = int(os.environ.get("PROBE_BATCH", "1000"))


def med3(fn) -> float:
    walls = []
    for _ in range(3):
        t0 = time.monotonic()
        fn()
        walls.append(time.monotonic() - t0)
    return round(sorted(walls)[1], 4)


def main() -> None:
    spark = get_spark(app_name="bench_idprobe")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 50 != 0).cache()
    n_corpus = corpus.count()
    fresh = (
        docs.where(F.col("doc_id") % 50 == 0)
        .limit(BATCH)
        .select("doc_id")
        .cache()
    )
    fresh.count()
    wh = tempfile.mkdtemp(prefix="pufs_idprobe_")
    spark.sql("DROP TABLE IF EXISTS probe_nd")
    spark.sql("DROP TABLE IF EXISTS probe_nd_meta")
    t0 = time.monotonic()
    dedup.build_near_dup_index(corpus, "probe_nd", wh + "/nd")
    build_index_s = round(time.monotonic() - t0, 2)
    index_rows = spark.table("probe_nd").count()

    exact_s = med3(
        lambda: indexes._exact_id_probe(spark, "probe_nd", fresh, "doc_id", 5)
    )
    t0 = time.monotonic()
    stats = indexes.build_id_bloom(spark, "probe_nd", id_col="doc_id")
    build_bloom_s = round(time.monotonic() - t0, 2)
    bloom_s = med3(
        lambda: indexes.probe_id_collisions(spark, "probe_nd", fresh, "doc_id")
    )
    # per-batch write cost: one content-addressed delta (replays
    # republish the same file, so timing 3x is honest)
    update_s = med3(
        lambda: indexes.update_id_bloom(spark, "probe_nd", fresh, "doc_id")
    )
    print(json.dumps({
        "sf_dir": SF_DIR,
        "n_corpus": n_corpus,
        "index_rows": index_rows,
        "batch_ids": BATCH,
        "build_index_s": build_index_s,
        "build_bloom_s": build_bloom_s,
        "bloom_mb": round(stats["m_bits"] / 8 / 1e6, 2),
        "bloom_fill": round(stats["fill_ratio"], 4),
        "exact_probe_s": exact_s,
        "bloom_probe_s": bloom_s,
        "bloom_update_s": update_s,
    }))


if __name__ == "__main__":
    main()
