#!/usr/bin/env python
"""Long-horizon soak of the standing-ingest loop: N micro-batches
through ``ingest_corpus_batch`` with a tight compaction trigger, so
compaction fires repeatedly mid-run. The claims this measures:

- per-batch wall stays FLAT as the corpus grows (the loop's core
  contract: nothing scans the corpus per batch);
- compaction keeps the index file counts bounded at steady state
  (sawtooth, not monotone growth);
- a batch immediately after a compaction folds in correctly (the
  swap is invisible to the loop).

Prints one JSON line with per-batch walls, accepted counts, file
counts, and compaction events. Results land in BASELINE.md.

Usage: [SPARK_GRAFT_SF_DIR=...] [SOAK_BATCHES=24] [SOAK_ANN=1] [SOAK_BLOOM=1]
       [SOAK_MAINT=1] python tools/soak_ingest.py

SOAK_ANN=1 adds the loop's THIRD guarded fold: a deterministic
pseudo-embedding rides each doc (the loop never runs a model) and
accepted rows fold into a persisted IVF index with a per-batch drift
stat — measuring that the embedding side is batch-sized too.

SOAK_MAINT=1 (implies SOAK_ANN + SOAK_BLOOM) exercises the quiet-point
maintenance orchestrator END TO END (r9 verdict finding 5): the bloom
sidecar starts at a deliberately tight capacity so saturation fires
mid-soak, the pseudo-embedding distribution SHIFTS at the halfway
batch so real drift accumulates, and ``run_maintenance`` runs at every
MAINT_EVERY'th batch boundary (the loop pauses — the documented
discipline). Expected record: exactly one IVF retrain shortly after
the shift (patience-gated), at least one bloom rebuild, and flat
post-maintenance walls.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pufs_spark.operators import dedup, indexes, ingest, similarity, text  # noqa: E402
from pufs_spark.session import get_spark  # noqa: E402
from pufs_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BATCHES = int(os.environ.get("SOAK_BATCHES", "24"))
WITH_MAINT = os.environ.get("SOAK_MAINT", "0") == "1"
WITH_ANN = WITH_MAINT or os.environ.get("SOAK_ANN", "0") == "1"
WITH_BLOOM = WITH_MAINT or os.environ.get("SOAK_BLOOM", "0") == "1"
MAINT_EVERY = int(os.environ.get("SOAK_MAINT_EVERY", "4"))
# SECOND, MILD drift (r11 verdict task 6): from the last quarter of
# the soak, this fraction of each batch's docs moves to a region the
# RETRAINED lineage never saw — sized to sit ABOVE the post-retrain
# calibration plateau but BELOW the recalibrated threshold, i.e. the
# drift the retrain trigger is blind to and only the thin-margin
# warning (drift_margin_warning, ratio < 2x) surfaces. 0 disables.
DRIFT2_FRAC = float(os.environ.get("SOAK_DRIFT2_FRAC", "0"))


def with_vec(df, dims=16, shifted=False):
    """Deterministic pseudo-embedding per doc id. ``shifted=True``
    moves the mass to the ORTHOGONAL half of the dims (the same
    construction the drift-signal tests pin): unshifted vectors live
    in dims [0, dims/2), shifted in [dims/2, dims) — cosine to every
    centroid trained on the unshifted corpus collapses toward zero,
    so mean_drop rises to the baseline for real, not via a mock.
    (A first attempt shifted vectors INTO a corner of the same
    subspace; they stayed well-aligned with the nearest centroid and
    the drift signal never cleared the calibration plateau.)"""
    half_d = dims // 2

    def comp(i):
        return (F.pmod(F.hash(F.col("doc_id") + F.lit(i)), F.lit(1000))
                .cast("float") / 500.0 - 1.0)

    base = [
        comp(i) if (i >= half_d) == shifted else F.lit(0.0).cast("float")
        for i in range(dims)
    ]
    return df.withColumn("embedding", F.array(*base))


def with_vec_mild(df, dims=16, frac=0.25):
    """Phase-3 vectors: a deterministic ``frac`` of docs NEGATE their
    phase-2 (shifted) vector — anti-aligned with the retrained
    lineage's B-half centroids (cos ≈ -c to the old nearest), so each
    affected doc's drop is near the full-drift baseline, and the BATCH
    mean_drop is ~frac × that: sized to land above the post-retrain
    calibration plateau but under the recalibrated threshold — the
    drift the patience trigger cannot see. (A first attempt used
    diagonal all-dims vectors; they landed CLOSER to the mixed-corpus
    centroids than the in-distribution mass and the window sat below
    the plateau — anti-alignment is what actually buys distance from
    every trained centroid.) The rest keep the phase-2 construction,
    which IS the retrained lineage's in-distribution mass."""
    half_d = dims // 2

    def comp(i):
        return (F.pmod(F.hash(F.col("doc_id") + F.lit(i)), F.lit(1000))
                .cast("float") / 500.0 - 1.0)

    is_mild = F.pmod(F.hash(F.col("doc_id") * 7919), F.lit(1000)) \
        < F.lit(int(frac * 1000))
    cols = [
        (
            F.when(is_mild, -comp(i)).otherwise(comp(i))
            if i >= half_d
            else F.lit(0.0).cast("float")
        )
        for i in range(dims)
    ]
    return df.withColumn("embedding", F.array(*cols))


def main() -> None:
    spark = get_spark(app_name="soak_ingest")
    raw = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs = with_vec(raw) if WITH_ANN else raw
    mod = N_BATCHES + 8
    half = N_BATCHES // 2
    corpus = docs.where(F.col("doc_id") % mod >= N_BATCHES).cache()
    wh = tempfile.mkdtemp(prefix="pufs_soak_")
    accepted_dir = os.path.join(wh, "accepted")
    for t in ("soak_nd", "soak_nd_meta", "soak_bm", "soak_bm_stats",
              "soak_ann", "soak_ann_meta", "soak_ann_centroids",
              "soak_ann_drift"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    dedup.build_near_dup_index(corpus, "soak_nd", wh + "/nd", rows=4)
    if WITH_BLOOM:
        # id-freshness guard fast path: probes run O(batch) against
        # the sidecar instead of scanning the index id column. Under
        # SOAK_MAINT the capacity is deliberately TIGHT (the seed's
        # own id count, no 2x headroom) so saturation genuinely fires
        # mid-soak and the orchestrator's bloom arm has real work.
        cap = corpus.select("doc_id").distinct().count() if WITH_MAINT \
            else None
        indexes.build_id_bloom(spark, "soak_nd", id_col="doc_id",
                               capacity=cap)
    text.build_bm25_index(corpus, "soak_bm", wh + "/bm")
    if WITH_ANN:
        similarity.build_ann_index(
            corpus.select("doc_id", "embedding"), "soak_ann", wh + "/ann",
            id_col="doc_id",
        )

    def corpus_now():
        if os.path.isdir(accepted_dir):
            return corpus.union(
                spark.read.parquet(accepted_dir).select(*corpus.columns)
            )
        return corpus

    walls, accepted, files_nd, files_bm, compactions = [], [], [], [], []
    maint: list[dict] = []
    for i in range(N_BATCHES):
        # drift-forcing shift: from the halfway batch on, embeddings
        # move to a corner of the cube the frozen centroids never saw;
        # from the last quarter (SOAK_DRIFT2_FRAC set), a SECOND, MILD
        # drift the retrained lineage's trigger is blind to
        d2_start = (3 * N_BATCHES) // 4 + 1
        if WITH_MAINT and DRIFT2_FRAC > 0 and i >= d2_start:
            src = with_vec_mild(raw, frac=DRIFT2_FRAC)
        elif WITH_MAINT and i >= half:
            src = with_vec(raw, shifted=True)
        else:
            src = docs
        batch = src.where(F.col("doc_id") % mod == i)
        t0 = time.time()
        r = ingest.ingest_corpus_batch(
            batch, corpus_now(), "soak_nd", "soak_bm", wh + "/bm",
            rows=4, batch_id=f"s{i}", skip_clean=True,
            max_files_per_bucket=2,     # tight: compaction fires often
            ann_table="soak_ann" if WITH_ANN else None, id_col="doc_id",
        )
        walls.append(round(time.time() - t0, 2))
        accepted.append(r.n_accepted)
        if r.n_accepted:
            r.accepted.write.mode("append").parquet(accepted_dir)
        files_nd.append(indexes.index_file_count(spark, "soak_nd"))
        files_bm.append(indexes.index_file_count(spark, "soak_bm"))
        if r.compacted:
            compactions.append({"batch": i, "tables": r.compacted})
        print(
            f"batch {i}: wall={walls[-1]}s accepted={r.n_accepted} "
            f"files nd={files_nd[-1]} bm={files_bm[-1]} "
            f"compacted={r.compacted}",
            flush=True,
        )
        if WITH_MAINT and (i + 1) % MAINT_EVERY == 0:
            # quiet point: the loop is paused between batches — the
            # same discipline run_maintenance documents
            t0 = time.time()
            mr = ingest.run_maintenance(
                spark, nd_table="soak_nd", ann_table="soak_ann",
                corpus_df=corpus_now().select("doc_id", "embedding"),
                ann_path=wh + "/ann", id_col="doc_id",
            )
            maint.append({
                "after_batch": i,
                "wall_s": round(time.time() - t0, 2),
                "bloom_rebuilt": mr.bloom_rebuilt,
                "ann_retrained": mr.ann_retrained,
                "drift_threshold": (
                    round(mr.drift_threshold, 4)
                    if mr.drift_threshold is not None else None
                ),
                "drift_window": (
                    [(b, round(d, 4)) for b, d in mr.drift_window]
                    if mr.drift_window else None
                ),
                "drift_plateau": (
                    round(mr.drift_plateau, 4)
                    if mr.drift_plateau is not None else None
                ),
                "drift_margin_ratio": (
                    round(mr.drift_margin_ratio, 2)
                    if mr.drift_margin_ratio is not None else None
                ),
                "drift_margin_warning": mr.drift_margin_warning,
            })
            print(f"maintenance after batch {i}: {maint[-1]}", flush=True)
    drift = None
    if WITH_ANN:
        drift = [
            {"batch_id": r["batch_id"], "mean_drop": round(r["mean_drop"], 4)}
            for r in similarity.ann_index_drift(spark, "soak_ann")
            .orderBy("batch_id").collect()
        ]
    second_drift = None
    if WITH_MAINT and DRIFT2_FRAC > 0 and maint:
        # the claim under test (r11 verdict task 6): the mild drift is
        # INVISIBLE to the patience trigger (no second retrain fires
        # after it starts) and the thin-margin warning is what caught
        # it — recorded per maintenance run above, summarized here
        d2_start = (3 * N_BATCHES) // 4 + 1
        post = [m for m in maint if m["after_batch"] >= d2_start]
        retrain_batches = [
            m["after_batch"] for m in maint if m["ann_retrained"]
        ]
        second_drift = {
            "frac": DRIFT2_FRAC,
            "starts_at_batch": d2_start,
            "retrains_after_start": sum(
                1 for b in retrain_batches if b >= d2_start
            ),
            "margin_warnings_after_start": [
                {"after_batch": m["after_batch"],
                 "ratio": m["drift_margin_ratio"],
                 "plateau": m["drift_plateau"],
                 "threshold": m["drift_threshold"],
                 "window": m["drift_window"]}
                for m in post if m["drift_margin_warning"]
            ],
        }
    print(json.dumps({
        "sf_dir": SF_DIR,
        "batches": N_BATCHES,
        "with_ann": WITH_ANN,
        "with_bloom": WITH_BLOOM,
        "with_maint": WITH_MAINT,
        "second_drift": second_drift,
        "maintenance": maint or None,
        "retrains_total": sum(1 for m in maint if m["ann_retrained"]),
        "bloom_rebuilds_total": sum(1 for m in maint if m["bloom_rebuilt"]),
        "bloom_stats": (
            {k: (round(v, 6) if isinstance(v, float) else v)
             for k, v in indexes.id_bloom_stats(spark, "soak_nd").items()}
            if WITH_BLOOM else None
        ),
        "ann_drift": drift,
        "walls_s": walls,
        "mean_wall_first_half_s": round(sum(walls[:half]) / half, 2),
        "mean_wall_second_half_s": round(sum(walls[half:]) / (N_BATCHES - half), 2),
        "accepted": accepted,
        "max_files_nd": max(files_nd),
        "max_files_bm": max(files_bm),
        "final_files_nd": files_nd[-1],
        "final_files_bm": files_bm[-1],
        "compactions": compactions,
    }))


if __name__ == "__main__":
    main()
