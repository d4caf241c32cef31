#!/usr/bin/env python
"""Benchmark the composed corpus-preparation sinks — the product
surface (operators/pipeline.py): per-stage breakdown of clean_corpus
(quality → lang → exact dedup → near-dup dedup, measured cumulatively
by re-running the growing prefix, so each stage's DELTA is its
marginal cost on the already-shrunk corpus), then the full
prepare_training_corpus sink (clean + decontaminate + split + write +
packing layout).

Prints one JSON line; numbers land in BASELINE.md's pipeline table.

Usage: [SPARK_GRAFT_SF_DIR=...] python tools/bench_pipeline.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pufs_spark.operators import dedup, pipeline, text  # noqa: E402
from pufs_spark.session import get_spark  # noqa: E402
from pufs_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="bench_pipeline")
    docs = load_table(spark, SF_DIR, "documents")
    force(docs)  # warm footers/JVM

    out: dict = {"sf_dir": SF_DIR}

    # -- clean_corpus stage prefixes (same operators, same order) ------
    def quality(d):
        q = text.quality_stats(d)
        return q.where(
            (F.col("n_tokens") >= 5)
            & (F.col("punct_ratio") <= 0.2)
            & (F.col("alpha_ratio") >= 0.5)
        ).select(*docs.columns)

    def lang(d):
        return (
            text.lang_id(d).where(F.col("pred_lang") == "en")
            .select(*docs.columns)
        )

    def exact(d):
        return (
            dedup.duplicate_rank(d)
            .where(F.col("dup_rank") == 1)
            .select(*docs.columns)
        )

    prefixes = [
        ("quality", lambda: quality(docs)),
        ("lang", lambda: lang(quality(docs))),
        ("exact_dedup", lambda: exact(lang(quality(docs)))),
        (
            "near_dup",
            lambda: pipeline.clean_corpus(docs),  # full composition
        ),
    ]
    stages = {}
    prev = 0.0
    for name, build in prefixes:
        t0 = time.time()
        frame = build()
        force(frame)
        wall = time.time() - t0
        stages[name] = {
            "cumulative_s": round(wall, 3),
            "delta_s": round(wall - prev, 3),
        }
        prev = wall
    stages["near_dup"]["rows_out"] = pipeline.clean_corpus(docs).count()
    out["clean_corpus_stages"] = stages

    # the rows=4 LSH knob (recall contract permitting — this corpus'
    # weakest true pair is s=0.83, see q_d1)
    t0 = time.time()
    force(pipeline.clean_corpus(docs, near_dup_rows=4))
    out["clean_corpus_rows4_s"] = round(time.time() - t0, 3)

    # -- the full sink --------------------------------------------------
    eval_df = docs.orderBy("doc_id").limit(20)
    sink = tempfile.mkdtemp(prefix="pufs_sink_")
    try:
        t0 = time.time()
        pipeline.prepare_training_corpus(
            docs,
            os.path.join(sink, "corpus"),
            split_weights={"train": 0.98, "val": 0.01, "test": 0.01},
            eval_df=eval_df,
            pack_budget=2048,
        )
        out["prepare_training_corpus_s"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(sink, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
