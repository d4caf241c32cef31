#!/usr/bin/env python
"""Streaming-side spread A/B (round 12, verdict task 4 / ROADMAP weak
spot 6): ``spread_for_compute`` is a no-op on streaming plans, so
``stream_clean_corpus`` micro-batches over a COMPACT columnar feed
(50k docs ≈ 15 MB → 1-2 byte-sized splits) can still run the quality +
lang-id gate expressions on 1-2 of 32 cores — the exact trap the batch
path escaped in r11.

Measures one availableNow drain of the full sf0.1 documents table
through stream_clean_corpus (gates + watermarked dedup + foreachBatch
count) under three configs:

  baseline  — the plan as the source sizes it (byte-sized splits)
  spread    — stream.repartition(32) injected before the gates
              (the new ``spread=`` parameter)
  maxpb     — spark.sql.files.maxPartitionBytes dropped to 512 KB so
              the SOURCE plans ~32 splits (no extra shuffle, but a
              session-global knob that also affects every other scan)

Prints one JSON line with per-config medians. The winner ships as the
documented default recommendation on stream_clean_corpus.

Usage: python tools/bench_stream_spread.py [sf_dir] [runs]
"""
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pufs_spark.operators import pipeline
from pufs_spark.session import get_spark

from pyspark.sql import functions as F

WORK = "/tmp/pufs_stream_spread"


def drain_once(spark, feed: str, ckpt: str, spread: int | None) -> tuple:
    counts = {"rows": 0}

    def fold(batch_df, _bid):
        counts["rows"] += batch_df.count()

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(feed)
    )
    cleaned = pipeline.stream_clean_corpus(
        stream, lang="en", spread=spread
    )
    t0 = time.monotonic()
    q = (
        cleaned.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return round(time.monotonic() - t0, 3), counts["rows"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="bench_stream_spread")
    shutil.rmtree(WORK, ignore_errors=True)
    feed = os.path.join(WORK, "feed")
    # compact single-file feed: the worst (and common) case — one
    # producer flushing a batch of documents as one parquet file
    (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .withColumn("ts", F.current_timestamp())
        .coalesce(1)
        .write.mode("overwrite").parquet(feed)
    )
    default_maxpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    out = {"sf_dir": sf_dir, "runs": runs, "configs": {}}
    i = 0
    # untimed warmup: the gate expressions JIT-compile on first
    # execution (~3-10 s of C2 time) — without this the first config
    # measured pays it and the comparison is ordering-biased
    drain_once(spark, feed, os.path.join(WORK, "ckpt-warm"), None)
    for name, spread, maxpb in (
        ("baseline", None, None),
        ("auto", "auto", None),  # r13 default: should match spread32 here
        ("spread32", 32, None),
        ("maxpb512k", None, str(512 * 1024)),
    ):
        walls, rows = [], None
        for _ in range(runs):
            i += 1
            ckpt = os.path.join(WORK, f"ckpt{i}")
            if maxpb is not None:
                spark.conf.set("spark.sql.files.maxPartitionBytes", maxpb)
            try:
                w, r = drain_once(spark, feed, ckpt, spread)
            finally:
                spark.conf.set(
                    "spark.sql.files.maxPartitionBytes", default_maxpb
                )
            walls.append(w)
            rows = r
        out["configs"][name] = {
            "median_s": round(statistics.median(walls), 3),
            "walls": walls,
            "rows_out": rows,
        }
    base = out["configs"]["baseline"]["median_s"]
    for c in out["configs"].values():
        c["vs_baseline"] = round(c["median_s"] / base, 3) if base else None
    # all configs must agree on output rows (same gate semantics)
    assert len({c["rows_out"] for c in out["configs"].values()}) == 1

    # many-split arm (r13 auto-spread Done criterion): a feed that
    # already plans >= cores/2 splits must resolve auto -> no exchange,
    # so "auto" and "off" are the SAME plan — measured to pin that the
    # probe itself costs nothing visible.
    wide = os.path.join(WORK, "feed-wide")
    (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .withColumn("ts", F.current_timestamp())
        .repartition(64)
        .write.mode("overwrite").parquet(wide)
    )
    out["wide_feed"] = {}
    for name, spread in (("off", None), ("auto", "auto")):
        walls = []
        for _ in range(runs):
            i += 1
            w, r = drain_once(spark, wide, os.path.join(WORK, f"ckpt{i}"), spread)
            walls.append(w)
        out["wide_feed"][name] = {
            "median_s": round(statistics.median(walls), 3), "walls": walls,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
