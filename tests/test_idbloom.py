"""Id-bloom sidecar (indexes.build_id_bloom / probe_id_collisions):
the O(batch) fast path for the ingest loop's id-freshness guard
(ROADMAP weak spot 6). The contract under test: answers are IDENTICAL
to the exact index-column probe (false positives fall back to it,
false negatives cannot exist because the bloom is maintained as a
superset of the index), a clean batch reads ZERO index rows, and every
crash ordering degrades to the exact probe rather than to a miss."""

import pytest

from pyspark.sql import functions as F

from pufs_spark.operators import dedup, indexes, ingest
from pufs_spark.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text").cache()


def _drop(spark, *tables):
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.fixture()
def nd_index(spark, docs, tmp_path_factory):
    """A near-dup index over half the docs, with an id-bloom sidecar."""
    wh = tmp_path_factory.mktemp("idbloom")
    _drop(spark, "blm_nd", "blm_nd_meta")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    dedup.build_near_dup_index(corpus, "blm_nd", str(wh / "nd"), buckets=8)
    stats = indexes.build_id_bloom(spark, "blm_nd", id_col="doc_id")
    yield corpus, stats
    _drop(spark, "blm_nd", "blm_nd_meta")


def test_probe_matches_exact_and_reads_zero_index_rows(
    spark, docs, nd_index, monkeypatch
):
    corpus, stats = nd_index
    in_index = docs.where(F.col("doc_id") % 2 == 0).limit(3)
    fresh = docs.where(F.col("doc_id") % 2 == 1).limit(50)

    # collisions: found via bloom hit -> exact fallback, same ids
    hits = indexes.probe_id_collisions(spark, "blm_nd", in_index, "doc_id")
    exact = indexes._exact_id_probe(spark, "blm_nd", in_index, "doc_id", 5)
    assert sorted(hits) == sorted(exact) and len(hits) == 3

    # a fresh batch must not touch the index at all: with the bloom
    # loaded, the exact fallback is the only index read — stub it out
    # and assert it is never reached (the bits-per-id default makes a
    # 50-id false positive essentially impossible)
    def boom(*a, **k):
        raise AssertionError("exact probe reached for a fresh batch")

    monkeypatch.setattr(indexes, "_exact_id_probe", boom)
    assert indexes.probe_id_collisions(spark, "blm_nd", fresh, "doc_id") == []


def test_update_folds_batch_ids(spark, docs, nd_index):
    _corpus, _stats = nd_index
    batch = docs.where(F.col("doc_id") % 2 == 1).limit(5)
    assert indexes.probe_id_collisions(spark, "blm_nd", batch, "doc_id") == []
    assert indexes.update_id_bloom(spark, "blm_nd", batch, "doc_id")
    # bloom now flags them; the index does NOT contain them, so the
    # exact fallback keeps the answer correct (superset, not oracle)
    assert indexes.probe_id_collisions(spark, "blm_nd", batch, "doc_id") == []
    # ... until the ids actually land in the index
    dedup.update_near_dup_index(batch, "blm_nd", batch_id="fold1")
    got = indexes.probe_id_collisions(spark, "blm_nd", batch, "doc_id")
    assert sorted(got) == sorted(r["doc_id"] for r in batch.collect())


def test_delta_log_is_batch_sized_and_replay_stable(spark, docs, nd_index):
    """update_id_bloom must write an O(batch) delta, never the
    O(corpus) bitmap — and a replayed batch republishes the SAME
    content-addressed file, so at-least-once delivery cannot grow the
    log."""
    _corpus, _stats = nd_index
    path = indexes._bloom_path(spark, "blm_nd")
    base_sig0 = indexes._bloom_stat(spark, path)
    batch = docs.where(F.col("doc_id") % 2 == 1).limit(8)
    indexes.update_id_bloom(spark, "blm_nd", batch, "doc_id")
    indexes.update_id_bloom(spark, "blm_nd", batch, "doc_id")  # replay
    deltas = indexes._list_bloom_deltas(spark, path)
    assert len(deltas) == 1, "replay must not add a second delta"
    assert indexes._bloom_stat(spark, path) == base_sig0, \
        "update must not rewrite the base bitmap"
    # the delta holds ≤ k × batch positions (8 bytes each + header)
    k = _stats["k"]
    assert deltas[0][1] <= 32 + 8 * k * 8


def test_fold_id_bloom_compacts_deltas_preserves_answers(
    spark, docs, nd_index
):
    _corpus, _stats = nd_index
    path = indexes._bloom_path(spark, "blm_nd")
    batches = [
        docs.where(F.col("doc_id") % 2 == 1).offset(i * 20).limit(20)
        for i in range(3)
    ]
    for b in batches:
        indexes.update_id_bloom(spark, "blm_nd", b, "doc_id")
    assert len(indexes._list_bloom_deltas(spark, path)) >= 1
    k, m, _n, before = indexes._load_bloom(spark, "blm_nd")
    assert not indexes.fold_id_bloom(spark, "blm_nd")  # below threshold
    assert indexes.fold_id_bloom(spark, "blm_nd", max_deltas=0)
    assert indexes._list_bloom_deltas(spark, path) == []
    k2, m2, _n2, after = indexes._load_bloom(spark, "blm_nd")
    assert (k, m) == (k2, m2)
    assert (before == after).all(), "fold changed the bit set"


def test_stale_geometry_delta_is_skipped_then_reaped(
    spark, docs, tmp_path_factory
):
    """A delta left over from before a rebuild at different sizing has
    the wrong (k, m): reads must skip it (the rebuild covered all
    ids), fold must delete it."""
    import os
    import shutil

    wh = tmp_path_factory.mktemp("idbloom_stale")
    _drop(spark, "blm_st", "blm_st_meta")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    dedup.build_near_dup_index(corpus, "blm_st", str(wh / "nd"), buckets=8)
    try:
        indexes.build_id_bloom(
            spark, "blm_st", id_col="doc_id", bits_per_id=8, k=4
        )
        batch = docs.where(F.col("doc_id") % 2 == 1).limit(5)
        indexes.update_id_bloom(spark, "blm_st", batch, "doc_id")
        path = indexes._bloom_path(spark, "blm_st")
        ddir = indexes._local_path(indexes._bloom_delta_dir(path))
        saved = [
            (n, open(os.path.join(ddir, n), "rb").read())
            for n in os.listdir(ddir)
        ]
        # rebuild at different sizing clears the log; "crash" restores
        # the stale delta afterwards
        indexes.build_id_bloom(spark, "blm_st", id_col="doc_id")
        assert indexes._list_bloom_deltas(spark, path) == []
        for n, data in saved:
            with open(os.path.join(ddir, n), "wb") as f:
                f.write(data)
        got = indexes.probe_id_collisions(spark, "blm_st", corpus.limit(3),
                                          "doc_id")
        assert len(got) == 3  # reads fine, stale delta skipped
        assert indexes.fold_id_bloom(spark, "blm_st", max_deltas=0)
        assert indexes._list_bloom_deltas(spark, path) == []
        shutil.rmtree(ddir, ignore_errors=True)
    finally:
        _drop(spark, "blm_st", "blm_st_meta")


def test_torn_tmp_delta_does_not_wedge_loop(spark, docs, nd_index):
    """A crash between _bloom_write_atomic's tmp write and its rename
    leaves 'delta-<md5>.tmp' in the delta dir. The listing must skip it
    (its bytes are torn — decoding would raise and wedge every
    subsequent probe/update/fold), and fold_id_bloom must reap it."""
    import os

    _corpus, _stats = nd_index
    path = indexes._bloom_path(spark, "blm_nd")
    ddir = indexes._local_path(indexes._bloom_delta_dir(path))
    os.makedirs(ddir, exist_ok=True)
    torn = os.path.join(ddir, "delta-deadbeef.tmp")
    with open(torn, "wb") as f:
        f.write(b"PFBLMD01-torn-halfway")  # magic ok, body garbage
    try:
        assert torn not in [p for p, _ in
                            indexes._list_bloom_deltas(spark, path)]
        # probe and update still work (pre-fix these raised ValueError)
        in_index = docs.where(F.col("doc_id") % 2 == 0).limit(2)
        assert len(indexes.probe_id_collisions(
            spark, "blm_nd", in_index, "doc_id")) == 2
        assert indexes.update_id_bloom(
            spark, "blm_nd", docs.limit(3), "doc_id")
        indexes.fold_id_bloom(spark, "blm_nd", max_deltas=0)
        assert not os.path.exists(torn), "fold must reap the stale .tmp"
    finally:
        if os.path.exists(torn):
            os.remove(torn)


def test_delta_republish_skips_existing_file(spark, docs, nd_index):
    """A replay re-publishing a content-addressed delta must not touch
    the existing file (if_absent skip) — on hdfs/s3a the old
    delete-then-rename path could, on a crash between the two steps,
    remove a LIVE delta and leave the bloom a subset of the index."""
    import os

    _corpus, _stats = nd_index
    path = indexes._bloom_path(spark, "blm_nd")
    batch = docs.where(F.col("doc_id") % 2 == 1).offset(100).limit(6)
    indexes.update_id_bloom(spark, "blm_nd", batch, "doc_id")
    deltas = indexes._list_bloom_deltas(spark, path)
    target = deltas[-1][0]
    st0 = os.stat(target)
    indexes.update_id_bloom(spark, "blm_nd", batch, "doc_id")  # replay
    st1 = os.stat(target)
    assert (st0.st_mtime_ns, st0.st_ino) == (st1.st_mtime_ns, st1.st_ino), \
        "replay rewrote an existing content-addressed delta"


def test_bloom_stats_report_actual_ids_not_capacity(
    spark, docs, tmp_path_factory
):
    """n_added_est must reflect ids actually inserted; capacity only
    sizes the bitmap (default 2× headroom) — the old encoding
    overstated insertions 2× from the first report."""
    wh = tmp_path_factory.mktemp("idbloom_nadded")
    _drop(spark, "blm_na", "blm_na_meta")
    corpus = docs.where(F.col("doc_id") % 7 == 0)
    n = corpus.select("doc_id").distinct().count()
    dedup.build_near_dup_index(corpus, "blm_na", str(wh / "nd"), buckets=8)
    try:
        stats = indexes.build_id_bloom(spark, "blm_na", id_col="doc_id")
        assert stats["n_added_est"] == n, \
            f"expected {n} inserted ids, got {stats['n_added_est']}"
    finally:
        _drop(spark, "blm_na", "blm_na_meta")


def test_saturated_bloom_still_exact(spark, docs, tmp_path_factory):
    """A deliberately under-sized bloom (2 bits/id) false-positives
    constantly — every answer must still equal the exact probe."""
    wh = tmp_path_factory.mktemp("idbloom_sat")
    _drop(spark, "blm_sat", "blm_sat_meta")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    dedup.build_near_dup_index(corpus, "blm_sat", str(wh / "nd"), buckets=8)
    try:
        indexes.build_id_bloom(
            spark, "blm_sat", id_col="doc_id", bits_per_id=2, k=2
        )
        assert indexes.needs_bloom_rebuild(spark, "blm_sat")
        fresh = docs.where(F.col("doc_id") % 2 == 1).limit(20)
        assert indexes.probe_id_collisions(spark, "blm_sat", fresh, "doc_id") == []
        stale = corpus.limit(4)
        got = indexes.probe_id_collisions(spark, "blm_sat", stale, "doc_id")
        assert sorted(got) == sorted(r["doc_id"] for r in stale.collect())
        # rebuild at sane sizing clears the saturation signal
        indexes.build_id_bloom(spark, "blm_sat", id_col="doc_id")
        assert not indexes.needs_bloom_rebuild(spark, "blm_sat")
    finally:
        _drop(spark, "blm_sat", "blm_sat_meta")


def test_no_sidecar_means_exact_mode(spark, docs, tmp_path_factory):
    wh = tmp_path_factory.mktemp("idbloom_none")
    _drop(spark, "blm_none", "blm_none_meta")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    dedup.build_near_dup_index(corpus, "blm_none", str(wh / "nd"), buckets=8)
    try:
        assert indexes.id_bloom_stats(spark, "blm_none") is None
        assert not indexes.update_id_bloom(
            spark, "blm_none", corpus.limit(3), "doc_id"
        )
        got = indexes.probe_id_collisions(
            spark, "blm_none", corpus.limit(3), "doc_id"
        )
        assert len(got) == 3
    finally:
        _drop(spark, "blm_none", "blm_none_meta")


def test_bloom_matches_distributed_build(spark, docs, nd_index):
    """The chunked applyInPandas build and the driver-side update path
    must agree bit-for-bit: fold the same ids via update into an empty
    bloom and compare membership decisions on a sample."""
    corpus, _stats = nd_index
    k, m, _n, bitmap = indexes._load_bloom(spark, "blm_nd")
    sample = docs.limit(200).select(
        "doc_id", indexes._bloom_pos_array("doc_id", k, m).alias("_pos")
    )
    member = {
        r["doc_id"]: all(
            (int(bitmap[p >> 3]) >> (p & 7)) & 1 for p in r["_pos"]
        )
        for r in sample.collect()
    }
    truth = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    for did, hit in member.items():
        if did in truth:
            assert hit, f"false negative for indexed id {did}"


@pytest.mark.soak  # multi-minute; see pytest.ini
def test_ingest_loop_uses_bloom_and_still_catches_collisions(
    spark, docs, tmp_path_factory, monkeypatch
):
    wh = tmp_path_factory.mktemp("idbloom_ingest")
    _drop(spark, "blg_nd", "blg_nd_meta", "blg_bm", "blg_bm_stats")
    corpus = docs.where(F.col("doc_id") % 4 == 0)
    dedup.build_near_dup_index(corpus, "blg_nd", str(wh / "nd"), buckets=8)
    from pufs_spark.operators import text

    text.build_bm25_index(corpus, "blg_bm", str(wh / "bm"), buckets=8)
    indexes.build_id_bloom(spark, "blg_nd", id_col="doc_id")
    try:
        fresh = docs.where(F.col("doc_id") % 4 == 1).limit(30)
        calls = []
        real = indexes._exact_id_probe
        monkeypatch.setattr(
            indexes, "_exact_id_probe",
            lambda *a, **kw: calls.append(1) or real(*a, **kw),
        )
        r = ingest.ingest_corpus_batch(
            fresh, corpus, "blg_nd", "blg_bm", str(wh / "bm"),
            batch_id="b1", skip_clean=True, id_col="doc_id",
        )
        assert r.n_accepted > 0
        assert calls == [], "fresh batch paid an exact index probe"
        # a NEW batch re-submitting an already-folded id with different
        # text (so no dedup stage absorbs it): bloom hit -> exact
        # confirm -> raise
        colliding_id = fresh.limit(1).collect()[0]["doc_id"]
        bad = spark.createDataFrame(
            [(colliding_id, "totally new words the index never saw")],
            "doc_id long, text string",
        )
        with pytest.raises(ingest.BatchIdCollisionError):
            ingest.ingest_corpus_batch(
                bad, corpus, "blg_nd", "blg_bm", str(wh / "bm"),
                batch_id="b2", skip_clean=True, id_col="doc_id",
            )
        assert calls, "collision must be confirmed by the exact probe"
    finally:
        _drop(spark, "blg_nd", "blg_nd_meta", "blg_bm", "blg_bm_stats")


@pytest.mark.soak  # multi-minute; see pytest.ini
def test_crash_between_bloom_and_fold_is_absorbed(
    spark, docs, tmp_path_factory
):
    """Crash ordering: bloom updated, index fold never ran. The batch's
    ids are bloom-hits but not index rows — the guard must NOT flag
    them (exact fallback decides), and the replayed fold proceeds."""
    wh = tmp_path_factory.mktemp("idbloom_crash")
    _drop(spark, "blc_nd", "blc_nd_meta", "blc_bm", "blc_bm_stats")
    corpus = docs.where(F.col("doc_id") % 4 == 0)
    dedup.build_near_dup_index(corpus, "blc_nd", str(wh / "nd"), buckets=8)
    from pufs_spark.operators import text

    text.build_bm25_index(corpus, "blc_bm", str(wh / "bm"), buckets=8)
    indexes.build_id_bloom(spark, "blc_nd", id_col="doc_id")
    try:
        batch = docs.where(F.col("doc_id") % 4 == 2).orderBy("doc_id").limit(10)
        # simulate: the loop updated the bloom, then died before folds
        indexes.update_id_bloom(spark, "blc_nd", batch, "doc_id")
        r = ingest.ingest_corpus_batch(
            batch, corpus, "blc_nd", "blc_bm", str(wh / "bm"),
            batch_id="c1", skip_clean=True, id_col="doc_id",
        )
        # no spurious BatchIdCollisionError; the loop's own content
        # dedup may still drop a genuine near-duplicate or two
        assert r.n_accepted >= 8
    finally:
        _drop(spark, "blc_nd", "blc_nd_meta", "blc_bm", "blc_bm_stats")


def test_restore_drill_rebuilds_bloom(spark, docs, tmp_path_factory):
    import shutil

    wh = tmp_path_factory.mktemp("idbloom_restore")
    _drop(spark, "blr_nd", "blr_nd_meta", "blr_bm", "blr_bm_stats")
    corpus = docs.where(F.col("doc_id") % 2 == 0).cache()
    dedup.build_near_dup_index(corpus, "blr_nd", str(wh / "nd"), buckets=8)
    from pufs_spark.operators import text

    text.build_bm25_index(corpus, "blr_bm", str(wh / "bm"), buckets=8)
    indexes.build_id_bloom(spark, "blr_nd", id_col="doc_id")
    try:
        import os

        bloom_file = indexes._local_path(indexes._bloom_path(spark, "blr_nd"))
        shutil.rmtree(str(wh / "nd"), ignore_errors=True)
        shutil.rmtree(
            indexes._local_path(indexes._sidecar_base(spark, "blr_nd")),
            ignore_errors=True,
        )
        if os.path.exists(bloom_file):
            os.remove(bloom_file)
        ingest.restore_lost_index(
            spark, "blr_nd", "near_dup", corpus, str(wh / "nd2"),
            surviving_table="blr_bm", buckets=8, rebuild_id_bloom=True,
        )
        stats = indexes.id_bloom_stats(spark, "blr_nd")
        assert stats is not None and stats["fill_ratio"] > 0
        got = indexes.probe_id_collisions(
            spark, "blr_nd", corpus.limit(3), "doc_id"
        )
        assert len(got) == 3
    finally:
        _drop(spark, "blr_nd", "blr_nd_meta", "blr_bm", "blr_bm_stats")
        corpus.unpersist()
