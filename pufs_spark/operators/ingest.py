"""The standing-ingest-service loop — the composition every persisted
index in this repo exists for, closed end to end: batches of documents
arrive forever, the corpus grows slowly, and EVERY per-batch cost must
be batch-sized, never corpus-sized.

Per batch, ``ingest_corpus_batch``:

1. cleans the batch with the stateless gates (quality, language —
   ``pipeline.clean_corpus`` semantics, narrow filters first);
2. exact-dedups within the batch (min-id representative per content
   hash — batch-sized shuffle of 64-hex digests);
3. drops batch docs that near-duplicate the EXISTING corpus via the
   persisted LSH index (``cross_near_dup_pairs(corpus_index=...)`` —
   the bucketed index scan is pre-partitioned, only the batch
   shuffles) and batch docs that near-duplicate an earlier-accepted
   doc of the SAME batch (``near_dup_pairs`` on the cleaned batch);
4. folds the accepted docs into the persisted indexes
   (``update_near_dup_index`` so the NEXT batch's step 3 sees them;
   ``update_bm25_index`` so search stays current; when ``ann_table``
   is set and the batch carries embeddings, ``update_ann_index`` so
   similarity search stays current too — with its per-batch drift
   stat feeding the retrain signal) — every fold carries the caller's
   ``batch_id``, and each index keeps a per-batch commit marker, so
   an at-least-once replay re-applies exactly the appends that didn't
   land (crash-point soak: tests/test_ingest_recovery);
5. compacts any index in place when its small-file count crosses
   the threshold (``indexes.needs_compaction`` → ``compact_index``
   into a generation-suffixed path) — the maintenance the append
   paths defer.

Returns the accepted rows (original columns) plus ingest stats. The
caller owns durability of the accepted rows (e.g.
``dataset.write_partitioned`` or ``prepare_training_corpus``); this
module owns the index side.

Scale notes: steps 1-2 are batch-local; step 3's cost is collision-
sized (BASELINE.md's persisted-index table: flat in corpus size);
step 4 shuffles only the batch by the bucket expressions; step 5 is
the only corpus-sized cost and amortizes over
``max_files_per_bucket`` batches. Nothing in the loop scans the
corpus's TEXT per batch; the only input that can grow with the corpus
is the id-freshness guard's column-pruned, shuffle-free probe of the
index's id column — and with an id-bloom sidecar
(``indexes.build_id_bloom``) even that becomes O(batch): the exact
probe then runs only on bloom hits (real collisions or ~1e-6 false
positives). Opt-out entirely for trusted feeds
(``check_id_freshness``).

Streaming: run this inside ``foreachBatch`` on the output of
``pipeline.stream_clean_corpus`` (skip_clean=True — the stream gates
already ran; the stream's bounded-state exact dedup de-dupes across
micro-batches, step 2 still catches within-batch pairs)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pufs_spark.operators import dedup, indexes, similarity, text


def restore_lost_index(
    spark,
    lost_table: str,
    kind: str,
    corpus_df: DataFrame,
    path: str,
    surviving_table: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    rows: int = 2,
    buckets: int = 64,
    n_centroids: int = 16,
    ivf_buckets: int = 16,
    rebuild_id_bloom: bool = False,
) -> list[str]:
    """Disaster-recovery runbook for a LOST persisted index (disk loss,
    fat-fingered rm of one index's directory): every index is fully
    redundant with the accepted-corpus parquet, so the restore is a
    one-shot rebuild — ``kind`` is ``"near_dup"``, ``"bm25"`` or
    ``"ivf"`` (the ivf corpus must carry ``vec_col``; the retrain also
    resets the drift baseline); ``corpus_df`` must be the service's
    accepted corpus (exactly the docs the surviving lineage contains),
    and the LSH/IVF params must equal the lost build's.

    The rebuild alone is NOT enough for a standing service: a fresh
    build has an EMPTY applied-batch ring, so an at-least-once replay
    of the last batch — whose docs are already in ``corpus_df`` and
    therefore in the rebuilt index — would re-fold it (double postings
    / signatures). Passing ``surviving_table`` seeds the restored
    ring + marker files from the surviving twin's applied ids (both
    indexes apply the same batch ids, so the survivor's ring is the
    ground truth). Returns the seeded ids.

    Run at a batch boundary: pause the loop, restore, resume — the
    drill tests/test_ingest_recovery.py::test_restore_lost_*_index
    pins rebuilt ≡ surviving-lineage query equality and a clean resume.
    """
    if kind not in ("near_dup", "bm25", "ivf"):
        raise ValueError(
            f"kind must be 'near_dup', 'bm25' or 'ivf', got {kind!r}"
        )
    for t in (lost_table, f"{lost_table}_meta", f"{lost_table}_stats",
              f"{lost_table}_centroids", f"{lost_table}_drift"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    if kind == "near_dup":
        dedup.build_near_dup_index(
            corpus_df, lost_table, path, text_col, id_col,
            k, num_hashes, bands, rows, buckets,
        )
    elif kind == "ivf":
        similarity.build_ann_index(
            corpus_df, lost_table, path, n_centroids, id_col, vec_col,
            ivf_buckets,
        )
    else:
        text.build_bm25_index(
            corpus_df, lost_table, path, text_col, id_col, buckets
        )

    applied: list[str] = []
    if surviving_table is not None:
        applied, _ = indexes.read_index_meta(spark, surviving_table)
        if not applied and spark.catalog.tableExists(f"{surviving_table}_stats"):
            srow, _mig = text._load_bm25_stats(
                spark, surviving_table,
                indexes.table_location(spark, surviving_table),
            )
            applied = list(srow.get("_batches") or [])
    if applied:
        applied = applied[-indexes.META_BATCH_RING:]
        if kind in ("near_dup", "ivf"):  # both use the _meta protocol
            indexes.write_index_meta(spark, lost_table, applied, None)
        else:
            srow, mig = text._load_bm25_stats(spark, lost_table, path)
            text._write_bm25_stats(
                spark, lost_table, srow["_n_total"], srow["_avgdl"],
                applied, None, mig,
            )
        for bid in applied:
            indexes.write_applied_marker(spark, lost_table, bid)
    if rebuild_id_bloom and kind == "near_dup":
        # The id-bloom sidecar died with the index's disk; a restore
        # that skips this leaves the loop in exact-probe mode (correct,
        # slower) — deployments using the sidecar pass True and the
        # bloom rebuilds from the same corpus the index just did.
        indexes.build_id_bloom(
            spark, lost_table, corpus_df.select(id_col), id_col
        )
    return applied


class BatchIdCollisionError(ValueError):
    """An accepted doc id already exists in the near-dup index and the
    batch is not a recognized replay: folding it would silently double
    BM25 postings and LSH signatures for that id (the contract
    ``ingest_corpus_batch`` documents and, since r8, enforces)."""


@dataclass
class IngestResult:
    accepted: DataFrame
    n_in: int
    n_after_clean: int
    n_after_exact: int
    n_accepted: int
    compacted: list[str]
    # True when the id-bloom sidecar crossed its saturation threshold
    # (indexes.needs_bloom_rebuild) — schedule a build_id_bloom rebuild
    # at a quiet point. Checked only when a bloom fold just ran, so the
    # O(bitmap) popcount amortizes over the fold cadence exactly like
    # the fold's own rewrite; between folds the flag stays False
    # (saturation moves batch-sized bits per batch — it can't jump).
    bloom_rebuild_due: bool = False


def _clean_gates(
    batch: DataFrame,
    text_col: str,
    min_tokens: int,
    max_punct_ratio: float,
    min_alpha_ratio: float,
    lang: str | None,
) -> DataFrame:
    cols = batch.columns
    q = text.quality_stats(batch, text_col)
    out = q.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
    ).select(*cols)
    if lang is not None:
        out = (
            text.lang_id(out, text_col)
            .where(F.col("pred_lang") == lang)
            .select(*cols)
        )
    return out


def ingest_corpus_batch(
    batch: DataFrame,
    corpus_df: DataFrame,
    nd_table: str,
    bm25_table: str,
    bm25_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    rows: int = 2,
    batch_id: str | None = None,
    skip_clean: bool = False,
    lang: str | None = "en",
    min_tokens: int = 5,
    max_punct_ratio: float = 0.2,
    min_alpha_ratio: float = 0.5,
    max_files_per_bucket: int = 8,
    compact_paths: dict[str, str] | None = None,
    check_id_freshness: bool = True,
    ann_table: str | None = None,
    vec_col: str = "embedding",
) -> IngestResult:
    """One turn of the ingest loop (see module docstring). The batch
    is MATERIALIZED once up front (persist) — every stage and both
    index updates reuse it. LSH parameters must match the ones the
    indexes were built with.

    ``corpus_df`` is the service's accepted-corpus frame (the parquet
    the caller persists accepted rows to). It is consulted ONLY to
    exact-verify the LSH survivors' Jaccard — a survivor-sized
    semi-join probe, not a corpus scan (cross_near_dup_pairs'
    contract). Caller contracts: batch ids are globally fresh (id
    collisions with the corpus would double BM25 postings), and
    ``corpus_df`` contains exactly the docs the indexes contain.

    The id-freshness contract is ENFORCED (``check_id_freshness``,
    default on): before the folds, the accepted ids are probed against
    the near-dup index and a collision raises
    ``BatchIdCollisionError`` instead of silently corrupting both
    indexes. Replays stay legal: a ``batch_id`` already applied to the
    ND index (ring, marker file, or a just-settled pending intent)
    skips the probe — its collisions ARE the prior application, and
    the guarded folds below no-op / partial-apply exactly as the crash
    -recovery tests pin. Cost note: the probe is a broadcast semi-join
    against the index's column-pruned id column — no shuffle, no
    signature/text read, but it IS the one per-batch read whose input
    grows with the corpus (O(corpus×bands) ids of a single column);
    trusted feeds (e.g. ids minted from a monotone sequence) can turn
    it off.

    ``ann_table`` (optional) names a persisted IVF index
    (``similarity.build_ann_index``) maintained as the loop's THIRD
    guarded fold: accepted rows' ``vec_col`` embeddings append under
    the same ``batch_id`` (exactly-once across replays, like the other
    two), the per-batch drift stat lands in ``<ann_table>_drift``
    (``ann_index_drift`` is the retrain signal), and the index joins
    the compaction sweep. The batch must then CARRY ``vec_col``
    (embeddings are computed upstream; this loop never runs a model).

    ``compact_paths`` maps table name → base path for generation-
    suffixed compaction output (defaults to ``<current location> +
    '-gN'``); compaction runs only when ``needs_compaction`` fires."""
    spark = batch.sparkSession
    cols = batch.columns
    if ann_table is not None and vec_col not in cols:
        raise ValueError(
            f"ann_table={ann_table!r} needs the batch to carry "
            f"{vec_col!r}; batch columns: {cols}"
        )
    # Self-heal before touching any index: a crash inside a prior
    # compaction's DROP→RENAME window leaves the rows only under
    # <table>__compact — complete the rename first (O(1) catalog ops).
    index_tables = [nd_table, bm25_table] + (
        [ann_table] if ann_table is not None else []
    )
    for t in index_tables:
        indexes.recover_interrupted_swap(spark, t)
    n_in = batch.count()

    cleaned = (
        batch
        if skip_clean
        else _clean_gates(
            batch, text_col, min_tokens, max_punct_ratio, min_alpha_ratio, lang
        ).persist()
    )
    n_after_clean = n_in if skip_clean else cleaned.count()
    # exact dedup within the batch: min-id representative per hash
    out = (
        dedup.duplicate_rank(cleaned, text_col, id_col)
        .where(F.col("dup_rank") == 1)
        .select(*cols)
        .persist()
    )
    n_after_exact = out.count()

    # near-dups vs the EXISTING corpus (persisted index; batch-sized)
    vs_corpus = dedup.cross_near_dup_pairs(
        out, corpus_df, threshold, text_col, id_col,
        k, num_hashes, bands, rows, corpus_index=nd_table,
    ).select(F.col("a").alias(id_col)).distinct()
    survivors = out.join(vs_corpus, id_col, "left_anti")
    # near-dups WITHIN the batch (min-id group representative — the
    # same tested keep policy clean_corpus uses)
    within = dedup.near_dup_pairs(
        survivors, threshold, text_col, id_col, k, num_hashes, bands, rows
    ).localCheckpoint()
    # localCheckpoint, not persist: the returned rows must survive the
    # index mutations below (compaction DELETES the old index files; a
    # lazily-recomputed lineage through the index scan would then read
    # missing files), and the caller holds them across future batches.
    accepted = dedup.dedup_keep_first(survivors, within, id_col).localCheckpoint()
    n_accepted = accepted.count()

    if n_accepted and check_id_freshness:
        # Settle any crashed append's intent first so "already applied"
        # is decided on reconciled state (a landed-but-uncommitted
        # append is a replay, not a collision).
        indexes.reconcile_pending(spark, nd_table)
        is_replay = batch_id is not None and (
            batch_id in indexes.read_index_meta(spark, nd_table)[0]
            or indexes.applied_marker_exists(spark, nd_table, batch_id)
        )
        if not is_replay:
            # O(batch) when an id-bloom sidecar exists
            # (indexes.build_id_bloom — ROADMAP weak spot 6); the
            # exact index-column probe otherwise, and as the fallback
            # for bloom hits — identical answers either way.
            clashes = indexes.probe_id_collisions(
                spark, nd_table, accepted.select(id_col), id_col, limit=5
            )
            if clashes:
                raise BatchIdCollisionError(
                    f"batch {batch_id!r}: accepted ids already present in "
                    f"index {nd_table!r} (sample: {sorted(clashes)}); ids "
                    "must be globally fresh — folding would double BM25 "
                    "postings and LSH signatures for these ids"
                )
    if n_accepted:
        # Fold the batch's ids into the bloom BEFORE the index folds
        # (no-op without a sidecar): any crash then leaves the bloom a
        # SUPERSET of the index — absorbed by the exact fallback — and
        # never a subset, which would wave a future collision through.
        # Runs even with the check off so a trusted feed can re-enable
        # it later without a rebuild.
        indexes.update_id_bloom(spark, nd_table, accepted.select(id_col), id_col)

    if n_accepted:
        # Both folds carry the SAME batch_id: each index has its own
        # commit marker (near-dup: <table>_meta via guarded_append;
        # BM25: the _pending intent in its stats row), so a foreachBatch
        # replay after a crash at ANY point — before, between, or after
        # the two updates — re-applies exactly the missing appends.
        dedup.update_near_dup_index(
            accepted, nd_table, text_col, id_col, k, num_hashes, bands, rows,
            batch_id=batch_id,
        )
        text.update_bm25_index(
            accepted, bm25_table, bm25_path, text_col, id_col,
            batch_id=batch_id,
        )
        if ann_table is not None:
            similarity.update_ann_index(
                accepted.select(id_col, vec_col), ann_table,
                id_col=id_col, vec_col=vec_col, batch_id=batch_id,
            )

    compacted: list[str] = []
    for t in index_tables:
        if indexes.needs_compaction(spark, t, max_files_per_bucket):
            loc = indexes.table_location(spark, t)
            base = (compact_paths or {}).get(t)
            if base is None:
                stem, _, gen = loc.rpartition("-g")
                base = (
                    f"{stem}-g{int(gen) + 1}"
                    if gen.isdigit() and stem
                    else f"{loc}-g1"
                )
            fs = indexes._local_path(base)
            indexes.compact_index(spark, t, fs if fs is not None else base)
            compacted.append(t)
    if ann_table is not None and similarity.compact_drift_log(spark, ann_table):
        # the drift log appends one tiny file per batch — same
        # small-file maintenance as the indexes, much cheaper rewrite
        compacted.append(f"{ann_table}_drift")
    bloom_rebuild_due = False
    if indexes.fold_id_bloom(spark, nd_table):
        # the id-bloom delta log is per-batch O(batch) appends; folding
        # it back into the base bitmap is its compaction (no-op when no
        # sidecar exists or the log is short)
        compacted.append(f"{nd_table}_idbloom")
        # the fold just paid one O(bitmap) pass, so the saturation
        # popcount piggybacks on the same cadence (the bitmap is still
        # in the signature cache) — surfacing the rebuild signal in the
        # loop's own output instead of leaving it to out-of-band polls
        bloom_rebuild_due = indexes.needs_bloom_rebuild(spark, nd_table)

    out.unpersist()
    if cleaned is not batch:
        cleaned.unpersist()
    return IngestResult(
        accepted=accepted,
        n_in=n_in,
        n_after_clean=n_after_clean,
        n_after_exact=n_after_exact,
        n_accepted=n_accepted,
        compacted=compacted,
        bloom_rebuild_due=bloom_rebuild_due,
    )


@dataclass
class MaintenanceResult:
    """What ``run_maintenance`` did and why (all fields are evidence
    the operator can log): ``drift_window`` holds the (batch_id,
    mean_drop) pairs the retrain decision inspected, newest last."""

    bloom_rebuilt: bool = False
    bloom_stats: dict | None = None
    ann_retrained: bool = False
    drift_threshold: float | None = None
    drift_window: list | None = None
    ann_ring: list | None = None
    # threshold / calibration-plateau ratio (r10 verdict What's-wrong
    # #3): the pre-shift soak lineage sat at 4-25x (threshold 0.1258
    # over a 0.005-0.03 plateau) but the POST-retrain lineage
    # recalibrated to only 1.5x (0.3562 over ~0.24) — a second, milder
    # drift could sit under that threshold indefinitely. The ratio is
    # recorded on every run with enough calibration rows, and a ratio
    # below DRIFT_MARGIN_RATIO_WARN also emits a UserWarning +
    # drift_margin_warning so the operator sees the thin margin in the
    # maintenance event, not in a post-mortem.
    drift_plateau: float | None = None
    drift_margin_ratio: float | None = None
    drift_margin_warning: str | None = None


#: warn when the drift threshold is under this multiple of the
#: calibration plateau — a drift smaller than (ratio x plateau) is
#: invisible to the retrain trigger, and below ~2x that blind spot
#: covers realistic second drifts (measured in the r10 soak).
DRIFT_MARGIN_RATIO_WARN = 2.0


def run_maintenance(
    spark,
    nd_table: str | None = None,
    ann_table: str | None = None,
    corpus_df: DataFrame | None = None,
    ann_path: str | None = None,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    max_fpp: float = 1e-4,
    drift_threshold: float | None = None,
    drift_patience: int = 3,
    calibrate_on: int = 3,
    drift_margin: float = 0.1,
    n_centroids: int = 16,
    ivf_buckets: int = 16,
) -> MaintenanceResult:
    """The quiet-point maintenance orchestrator (r8 verdict task 2):
    the ingest loop SURFACES ``bloom_rebuild_due`` and the drift
    signal but leaves acting on them to the operator — this wires
    both, to be called at a batch boundary (pause the loop, run,
    resume — the same discipline as ``restore_lost_index``). Both
    arms are corpus-sized when they fire, which is exactly why they
    live here and not inside the per-batch loop.

    Bloom arm (``nd_table``): when ``indexes.needs_bloom_rebuild``
    (est_fpp past ``max_fpp``), rebuild the sidecar from the index's
    own id column via ``build_id_bloom`` — capacity re-defaults to 2×
    the CURRENT distinct-id count, so each rebuild restores the same
    relative headroom the original build had.

    IVF arm (``ann_table`` + ``corpus_df``): retrain when the
    ``drift_patience`` NEWEST batches in ``ann_index_drift`` ALL show
    ``mean_drop`` above the threshold. ``drift_threshold=None``
    calibrates it from the current lineage's own first
    ``calibrate_on`` batches (max of their mean_drop + ``drift_margin``
    — the runbook's "early-batch plateau"), and then requires at least
    ``calibrate_on + drift_patience`` batch rows so the calibration
    and trigger windows cannot overlap. The retrain is
    ``similarity.build_ann_index`` over ``corpus_df`` (the service's
    full accepted corpus, carrying ``vec_col``) at ``ann_path``
    (default: the index's current location — the same-path retrain
    whose drift-log reset r8 pinned). ``build_ann_index`` does not
    touch ``<table>_meta``, so the applied-batch ring and marker files
    survive and an at-least-once replay of the last pre-retrain batch
    stays a no-op — this function VERIFIES that and re-seeds the ring
    if a future regression ever drops it. The retrain also resets the
    drift baseline (fresh ``__build__`` row), so the patience counter
    restarts from zero post-retrain by construction.

    A drift log without the ``ts`` column (written before retention
    existed) has no recency order, so the IVF arm skips it — the
    first retrain (manual, or after enough fresh batches at the next
    lineage) recreates the log in the current shape."""
    res = MaintenanceResult()
    if nd_table is not None and indexes.needs_bloom_rebuild(
        spark, nd_table, max_fpp
    ):
        res.bloom_stats = indexes.build_id_bloom(
            spark, nd_table, id_col=id_col
        )
        res.bloom_rebuilt = True

    if ann_table is None:
        return res
    drift_t = f"{ann_table}_drift"
    if not spark.catalog.tableExists(drift_t):
        return res
    if "ts" not in spark.table(drift_t).columns:
        return res  # pre-retention log: no recency order to trust
    rows = sorted(
        (
            r for r in similarity.ann_index_drift(spark, ann_table).collect()
            if r["batch_id"] != "__build__"
        ),
        key=lambda r: r["batch_id"],
    )
    # ann_index_drift carries no ts (it's the operator-facing view);
    # re-key by append time for recency
    ts_by_id = {
        r["batch_id"]: r["ts"] for r in spark.table(drift_t).collect()
    }
    rows.sort(key=lambda r: ts_by_id[r["batch_id"]])
    threshold = drift_threshold
    need = drift_patience
    if threshold is None:
        # Calibration reads the lineage's FIRST batches; drift-log
        # retention guarantees exactly DRIFT_KEEP_FIRST of them survive
        # compaction (similarity.DRIFT_KEEP_FIRST), so a wider window
        # would silently slide onto newer — possibly drifted — batches
        # once the log wraps. Fail loudly instead (ADVICE r9).
        if calibrate_on > similarity.DRIFT_KEEP_FIRST:
            raise ValueError(
                f"calibrate_on={calibrate_on} exceeds the "
                f"{similarity.DRIFT_KEEP_FIRST} oldest rows drift-log "
                "retention preserves; pass drift_threshold explicitly "
                "or lower calibrate_on"
            )
        if len(rows) < calibrate_on + drift_patience:
            return res  # not enough signal to calibrate AND trigger
        threshold = (
            max(r["mean_drop"] for r in rows[:calibrate_on]) + drift_margin
        )
    res.drift_threshold = threshold
    # Margin observability: how far the threshold sits above the
    # lineage's own calibration plateau. Computed for explicit
    # thresholds too — an operator-pinned threshold can be just as
    # thin as a recalibrated one. Guarded by the same DRIFT_KEEP_FIRST
    # retention bound as auto-calibration (ADVICE r11): compaction
    # preserves exactly that many oldest rows, so a wider window would
    # silently slide onto post-drift batches once the log wraps and
    # misreport the plateau (spurious warning, or worse, a masked thin
    # margin). Auto-calibration already raised above; this only gates
    # the explicit-threshold path, where plateau is best-effort.
    if (
        len(rows) >= calibrate_on
        and calibrate_on <= similarity.DRIFT_KEEP_FIRST
    ):
        plateau = max(r["mean_drop"] for r in rows[:calibrate_on])
        res.drift_plateau = plateau
        if plateau > 0:
            ratio = threshold / plateau
            res.drift_margin_ratio = ratio
            if ratio < DRIFT_MARGIN_RATIO_WARN:
                res.drift_margin_warning = (
                    f"drift threshold {threshold:.4f} is only "
                    f"{ratio:.2f}x the calibration plateau "
                    f"{plateau:.4f} (< {DRIFT_MARGIN_RATIO_WARN}x): a "
                    "drift milder than the threshold/plateau gap will "
                    "never trigger a retrain on this lineage"
                )
                import warnings

                warnings.warn(res.drift_margin_warning, stacklevel=2)
    window = rows[-drift_patience:]
    res.drift_window = [(r["batch_id"], r["mean_drop"]) for r in window]
    if len(window) < need or not all(
        r["mean_drop"] > threshold for r in window
    ):
        return res
    if corpus_df is None:
        raise ValueError(
            f"IVF drift trigger fired for {ann_table!r} but no corpus_df "
            "was provided to retrain from"
        )
    ring_before, _ = indexes.read_index_meta(spark, ann_table)
    path = ann_path or indexes.table_location(spark, ann_table)
    similarity.build_ann_index(
        corpus_df, ann_table, path, n_centroids, id_col, vec_col, ivf_buckets
    )
    ring_after, _ = indexes.read_index_meta(spark, ann_table)
    if ring_after != ring_before:
        # build_ann_index leaves <table>_meta alone by contract; if a
        # future change breaks that, the replay guard must not be lost
        indexes.write_index_meta(spark, ann_table, ring_before, None)
        ring_after = ring_before
    res.ann_retrained = True
    res.ann_ring = list(ring_after)
    return res
