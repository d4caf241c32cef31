"""Quiet-point maintenance orchestrator (ingest.run_maintenance, r8
verdict task 2): the loop surfaces bloom_rebuild_due and the IVF drift
signal; this wires acting on them. Contracts under test: a drifted
corpus retrains EXACTLY once (the fresh baseline restarts the patience
counter), the applied-batch ring survives the retrain so a replay of
the last pre-retrain batch stays a no-op, the drift baseline resets,
and a saturated id-bloom is rebuilt back under its fpp target."""

import pytest

from pyspark.sql import functions as F

from pufs_spark.operators import dedup, indexes, ingest, similarity
from pufs_spark.tables import load_table
from tests.conftest import SF_DIR


def _drop(spark, *tables):
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def LO():
    return F.expr(
        "transform(embedding, (x, i) ->"
        " case when i < 32 then x else cast(0.0 as float) end)"
    ).alias("embedding")


def HI():
    return F.expr(
        "transform(embedding, (x, i) ->"
        " case when i >= 32 then x else cast(0.0 as float) end)"
    ).alias("embedding")


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    ).cache()


@pytest.mark.soak  # multi-minute; see pytest.ini
def test_drift_triggered_retrain_exactly_once_ring_survives(
    spark, emb, tmp_path_factory
):
    """Drifted corpus (orthogonal-subspace batches, the same
    construction the drift-signal test pins): after ``patience``
    drifted batches the orchestrator retrains ONCE — the retrained
    baseline resets, a second call does nothing, the ring survives,
    and a replay of the last batch is a no-op."""
    wh = tmp_path_factory.mktemp("maint_ivf")
    _drop(spark, "mt_ann", "mt_ann_centroids", "mt_ann_meta", "mt_ann_drift")
    seed = emb.where(F.col("doc_id") % 4 == 0).select("doc_id", LO())
    similarity.build_ann_index(
        seed, "mt_ann", str(wh / "idx"), n_centroids=8,
        id_col="doc_id", buckets=8,
    )
    indexes.write_index_meta(spark, "mt_ann", [], None)  # ring table
    try:
        corpus = seed
        batches = []
        for i in range(1, 4):
            b = emb.where(F.col("doc_id") % 4 == i).select(
                (F.col("doc_id") + 1_000_000 * i).alias("doc_id"), HI()
            ).localCheckpoint()
            batches.append((f"d{i}", b))
            similarity.update_ann_index(
                b, "mt_ann", id_col="doc_id", batch_id=f"d{i}"
            )
            corpus = corpus.unionByName(b)
        corpus = corpus.localCheckpoint()
        ring_before, _ = indexes.read_index_meta(spark, "mt_ann")
        assert ring_before == ["d1", "d2", "d3"]
        n_rows = spark.table("mt_ann").count()

        # orthogonal batches: mean_sim == 0, mean_drop == baseline
        # mean_sim (>0.3 on this data) — 0.25 is a clear threshold
        res = ingest.run_maintenance(
            spark, ann_table="mt_ann", corpus_df=corpus,
            id_col="doc_id", drift_threshold=0.25, drift_patience=3,
            n_centroids=8, ivf_buckets=8,
        )
        assert res.ann_retrained
        assert [b for b, _ in res.drift_window] == ["d1", "d2", "d3"]
        assert all(drop > 0.25 for _, drop in res.drift_window)

        # retrained index holds the full corpus; baseline reset
        assert spark.table("mt_ann").count() == n_rows == corpus.count()
        drift_rows = {
            r["batch_id"]: r
            for r in similarity.ann_index_drift(spark, "mt_ann").collect()
        }
        assert set(drift_rows) == {"__build__"}
        assert drift_rows["__build__"]["mean_drop"] == 0.0
        # the new centroids cover the drifted subspace: the build
        # baseline's own quality is decent again (pre-retrain batches
        # scored exactly 0 against the lo-subspace centroids)
        assert drift_rows["__build__"]["mean_sim"] > 0.2

        # ring survived: exactly-once replay of the LAST batch no-ops
        assert res.ann_ring == ring_before
        ring_after, _ = indexes.read_index_meta(spark, "mt_ann")
        assert ring_after == ring_before
        last_id, last_b = batches[-1]
        similarity.update_ann_index(
            last_b, "mt_ann", id_col="doc_id", batch_id=last_id
        )
        assert spark.table("mt_ann").count() == n_rows, \
            "replayed batch re-folded after retrain: ring lost"
        assert set(
            r["batch_id"]
            for r in spark.table("mt_ann_drift").collect()
        ) == {"__build__"}, "replay logged a drift row"

        # exactly once: the reset baseline restarts the patience count
        res2 = ingest.run_maintenance(
            spark, ann_table="mt_ann", corpus_df=corpus,
            id_col="doc_id", drift_threshold=0.25, drift_patience=3,
            n_centroids=8, ivf_buckets=8,
        )
        assert not res2.ann_retrained
    finally:
        _drop(spark, "mt_ann", "mt_ann_centroids", "mt_ann_meta",
              "mt_ann_drift")


@pytest.mark.soak  # multi-minute; see pytest.ini
def test_auto_calibrated_threshold_waits_then_fires(
    spark, emb, tmp_path_factory
):
    """drift_threshold=None calibrates on the lineage's first batches:
    in-distribution batches never trigger (their drops sit at the
    plateau the threshold was cut from), and the trigger refuses to
    fire before calibrate_on + patience batches exist."""
    wh = tmp_path_factory.mktemp("maint_cal")
    _drop(spark, "mt_cal", "mt_cal_centroids", "mt_cal_meta", "mt_cal_drift")
    seed = emb.where(F.col("doc_id") % 4 == 0).select("doc_id", LO())
    similarity.build_ann_index(
        seed, "mt_cal", str(wh / "idx"), n_centroids=8,
        id_col="doc_id", buckets=8,
    )
    try:
        indist = emb.where(F.col("doc_id") % 4 == 1).select("doc_id", LO())
        for i in range(2):  # fewer than calibrate_on + patience
            similarity.update_ann_index(
                indist.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(1_000_000 * (i + 1))
                ),
                "mt_cal", id_col="doc_id", batch_id=f"c{i}",
            )
        res = ingest.run_maintenance(
            spark, ann_table="mt_cal", corpus_df=seed, id_col="doc_id",
            drift_patience=2, calibrate_on=2, drift_margin=0.05,
        )
        assert not res.ann_retrained and res.drift_threshold is None

        for i in range(2, 4):  # now enough rows — but in-distribution
            similarity.update_ann_index(
                indist.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(1_000_000 * (i + 1))
                ),
                "mt_cal", id_col="doc_id", batch_id=f"c{i}",
            )
        res = ingest.run_maintenance(
            spark, ann_table="mt_cal", corpus_df=seed, id_col="doc_id",
            drift_patience=2, calibrate_on=2, drift_margin=0.05,
        )
        assert not res.ann_retrained
        assert res.drift_threshold is not None  # calibrated, not hit

        # two genuinely drifted batches push past the calibrated bar
        for i, m in enumerate((7, 8)):
            similarity.update_ann_index(
                emb.where(F.col("doc_id") % 4 == 2).select(
                    (F.col("doc_id") + 1_000_000 * m).alias("doc_id"), HI()
                ),
                "mt_cal", id_col="doc_id", batch_id=f"s{i}",
            )
        corpus = seed  # content irrelevant: assert the retrain fired
        res = ingest.run_maintenance(
            spark, ann_table="mt_cal", corpus_df=corpus, id_col="doc_id",
            drift_patience=2, calibrate_on=2, drift_margin=0.05,
            n_centroids=8, ivf_buckets=8,
        )
        assert res.ann_retrained
        assert [b for b, _ in res.drift_window] == ["s0", "s1"]
    finally:
        _drop(spark, "mt_cal", "mt_cal_centroids", "mt_cal_meta",
              "mt_cal_drift")


def test_bloom_arm_rebuilds_saturated_sidecar(spark, tmp_path_factory):
    """A deliberately under-sized bloom saturates (needs_bloom_rebuild
    fires); the orchestrator rebuilds it at the current corpus size
    with default sizing, dropping est_fpp back under the target, and a
    second call is a no-op."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    wh = tmp_path_factory.mktemp("maint_bloom")
    _drop(spark, "mt_nd", "mt_nd_meta")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    dedup.build_near_dup_index(corpus, "mt_nd", str(wh / "nd"), buckets=8)
    try:
        indexes.build_id_bloom(
            spark, "mt_nd", id_col="doc_id", bits_per_id=2, k=2
        )
        assert indexes.needs_bloom_rebuild(spark, "mt_nd")
        res = ingest.run_maintenance(spark, nd_table="mt_nd")
        assert res.bloom_rebuilt
        assert res.bloom_stats["est_fpp"] < 1e-4
        assert not indexes.needs_bloom_rebuild(spark, "mt_nd")
        # answers unchanged: ids in the index still flagged via bloom
        sample = corpus.limit(3)
        got = indexes.probe_id_collisions(spark, "mt_nd", sample, "doc_id")
        assert len(got) == 3
        res2 = ingest.run_maintenance(spark, nd_table="mt_nd")
        assert not res2.bloom_rebuilt
    finally:
        _drop(spark, "mt_nd", "mt_nd_meta")


def test_thin_drift_margin_is_recorded_and_warned(
    spark, emb, tmp_path_factory
):
    """r10 verdict What's-wrong #3: the post-retrain soak lineage
    recalibrated to a threshold only 1.5x its plateau — a second,
    milder drift would never trigger. Every maintenance run with
    enough calibration rows must record threshold/plateau, and a ratio
    under DRIFT_MARGIN_RATIO_WARN must surface as a UserWarning plus a
    drift_margin_warning field in the event. Drift rows are synthetic
    (controlled mean_sim) so the ratio is exact, not corpus-dependent."""
    wh = tmp_path_factory.mktemp("maint_margin")
    _drop(spark, "mt_mg", "mt_mg_centroids", "mt_mg_meta", "mt_mg_drift")
    seed = emb.where(F.col("doc_id") % 4 == 0).select("doc_id", LO())
    similarity.build_ann_index(
        seed, "mt_mg", str(wh / "idx"), n_centroids=8,
        id_col="doc_id", buckets=8,
    )
    try:
        base = {
            r["batch_id"]: r["mean_sim"]
            for r in spark.table("mt_mg_drift").collect()
        }["__build__"]
        # plateau drop 0.10 on the calibration rows; later rows a bit
        # higher but under every threshold used below
        for bid, drop in (("b0", 0.10), ("b1", 0.10),
                          ("b2", 0.12), ("b3", 0.12)):
            similarity._append_drift_row(
                spark, "mt_mg", bid,
                {"n": 10, "mean_sim": base - drop, "p10_sim": base - drop},
            )

        # thin explicit threshold: 0.15 over a 0.10 plateau = 1.5x
        with pytest.warns(UserWarning, match=r"only 1\.50x"):
            res = ingest.run_maintenance(
                spark, ann_table="mt_mg", corpus_df=seed, id_col="doc_id",
                drift_threshold=0.15, calibrate_on=2, drift_patience=2,
            )
        assert not res.ann_retrained
        assert res.drift_plateau == pytest.approx(0.10)
        assert res.drift_margin_ratio == pytest.approx(1.5)
        assert "never trigger a retrain" in res.drift_margin_warning

        # auto-calibrated threshold = plateau + margin: 0.15 -> same
        # thin ratio, same warning (the r10 soak's exact shape)
        with pytest.warns(UserWarning, match="calibration plateau"):
            res_auto = ingest.run_maintenance(
                spark, ann_table="mt_mg", corpus_df=seed, id_col="doc_id",
                calibrate_on=2, drift_patience=2, drift_margin=0.05,
            )
        assert res_auto.drift_margin_ratio == pytest.approx(1.5)

        # comfortable margin: no warning, ratio still recorded
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("error")
            res_ok = ingest.run_maintenance(
                spark, ann_table="mt_mg", corpus_df=seed, id_col="doc_id",
                drift_threshold=0.5, calibrate_on=2, drift_patience=2,
            )
        assert res_ok.drift_margin_ratio == pytest.approx(5.0)
        assert res_ok.drift_margin_warning is None
    finally:
        _drop(spark, "mt_mg", "mt_mg_centroids", "mt_mg_meta",
              "mt_mg_drift")


def test_plateau_skipped_when_window_exceeds_retention(
    spark, emb, tmp_path_factory
):
    """ADVICE r12: the margin-observability block computed the plateau
    over rows[:calibrate_on] for EXPLICIT thresholds without the
    DRIFT_KEEP_FIRST retention check auto-calibration enforces — after
    drift-log compaction only the DRIFT_KEEP_FIRST oldest rows are
    guaranteed to be calibration-era, so a wider window slides onto
    post-drift batches and misreports the plateau (here: a spurious
    1.2x warning where the true margin is 6x). The plateau must be
    skipped (None, no warning) when calibrate_on exceeds retention."""
    import warnings as _w

    wh = tmp_path_factory.mktemp("maint_ret")
    _drop(spark, "mt_rt", "mt_rt_centroids", "mt_rt_meta", "mt_rt_drift")
    seed = emb.where(F.col("doc_id") % 4 == 0).select("doc_id", LO())
    similarity.build_ann_index(
        seed, "mt_rt", str(wh / "idx"), n_centroids=8,
        id_col="doc_id", buckets=8,
    )
    try:
        base = {
            r["batch_id"]: r["mean_sim"]
            for r in spark.table("mt_rt_drift").collect()
        }["__build__"]
        # 8 calibration-era rows at drop 0.10 (exactly DRIFT_KEEP_FIRST
        # survive compaction), then 2 post-drift rows at 0.50 that a
        # 9-wide window would mistake for plateau
        for i in range(similarity.DRIFT_KEEP_FIRST):
            similarity._append_drift_row(
                spark, "mt_rt", f"c{i}",
                {"n": 10, "mean_sim": base - 0.10, "p10_sim": base - 0.10},
            )
        for i in range(2):
            similarity._append_drift_row(
                spark, "mt_rt", f"d{i}",
                {"n": 10, "mean_sim": base - 0.50, "p10_sim": base - 0.50},
            )
        with _w.catch_warnings():
            _w.simplefilter("error")  # a spurious margin warning fails
            res = ingest.run_maintenance(
                spark, ann_table="mt_rt", corpus_df=seed, id_col="doc_id",
                drift_threshold=0.60,
                calibrate_on=similarity.DRIFT_KEEP_FIRST + 1,
                drift_patience=2,
            )
        assert not res.ann_retrained
        assert res.drift_plateau is None
        assert res.drift_margin_ratio is None
        assert res.drift_margin_warning is None
        # within retention the plateau is still reported as before
        res2 = ingest.run_maintenance(
            spark, ann_table="mt_rt", corpus_df=seed, id_col="doc_id",
            drift_threshold=0.60,
            calibrate_on=similarity.DRIFT_KEEP_FIRST,
            drift_patience=2,
        )
        assert res2.drift_plateau == pytest.approx(0.10)
        assert res2.drift_margin_ratio == pytest.approx(6.0)
    finally:
        _drop(spark, "mt_rt", "mt_rt_centroids", "mt_rt_meta",
              "mt_rt_drift")
