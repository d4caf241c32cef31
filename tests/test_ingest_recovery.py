"""Crash/replay soak for the standing-ingest loop — the r6 verdict's
task 2: inject a crash at every dangerous point of
``ingest_corpus_batch``'s index-fold sequence, replay the batch with
the same batch_id (foreachBatch at-least-once semantics), and require
both persisted indexes to equal a FRESH one-shot build over the final
corpus — without ever calling build_*_index to recover.

Injection points:
  A. between ``update_near_dup_index`` and ``update_bm25_index``
     (near-dup applied, BM25 untouched);
  B. strictly between BM25's postings append and its stats commit
     (the two-write window the commit marker closes);
  C. between the near-dup intent write and its signature append;
  D. strictly between the near-dup append and its meta commit.

Each point exercises a different arm of the commit markers
(``indexes.guarded_append`` for the near-dup index, the ``_pending``
intent in the BM25 stats row)."""

import pytest

# crash-recovery soak fleet: every test replays multi-index ingest loops with injected crashes (~10 min total) — opt-in (see pytest.ini)
pytestmark = pytest.mark.soak

from pyspark.sql import functions as F

from pufs_spark.operators import dedup, indexes, ingest, text
from pufs_spark.tables import load_table
from tests.conftest import SF_DIR

ND, BM = "rec_nd", "rec_bm"


def _drop(spark):
    for t in (ND, f"{ND}_meta", BM, f"{BM}_stats",
              "rec_ref", "rec_ref_stats", "rec_refnd"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.fixture()
def loop(spark, tmp_path):
    """Seeded indexes + the batches; yields a runner that ingests a
    batch (optionally crashing), and a checker that asserts both
    indexes ≡ fresh builds over the expected final corpus."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") < 60).cache()
    batches = [
        docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 20))
        for lo in (60, 80, 100)
    ]
    _drop(spark)
    dedup.build_near_dup_index(corpus, ND, str(tmp_path / "nd"), rows=4, buckets=8)
    text.build_bm25_index(corpus, BM, str(tmp_path / "bm"), buckets=8)

    def run(batch, corpus_now, batch_id):
        return ingest.ingest_corpus_batch(
            batch, corpus_now, ND, BM, str(tmp_path / "bm"),
            rows=4, batch_id=batch_id, skip_clean=True,
        )

    def check(final_corpus):
        text.build_bm25_index(final_corpus, "rec_ref", str(tmp_path / "ref"),
                              buckets=8)
        q = ["spark", "join", "window"]
        got = {r["doc_id"]: r["score"]
               for r in text.bm25_search(final_corpus, q,
                                         corpus_index=BM).collect()}
        want = {r["doc_id"]: r["score"]
                for r in text.bm25_search(final_corpus, q,
                                          corpus_index="rec_ref").collect()}
        assert set(got) == set(want) and got
        for k in got:
            assert got[k] == pytest.approx(want[k], rel=1e-9)
        s = spark.table(f"{BM}_stats").collect()[0]
        assert s["_n_total"] == final_corpus.count()
        assert s["_pending"] is None

        # near-dup index rows ≡ fresh build (same LSH params)
        dedup.build_near_dup_index(final_corpus, "rec_refnd",
                                   str(tmp_path / "refnd"), rows=4, buckets=8)
        cols = ["doc_id", "band", "key"]
        got_nd = {tuple(r) for r in spark.table(ND).select(cols).collect()}
        want_nd = {tuple(r)
                   for r in spark.table("rec_refnd").select(cols).collect()}
        assert got_nd == want_nd

    try:
        yield spark, corpus, batches, run, check
    finally:
        _drop(spark)


def _ingest_all_with_crash(spark, corpus, batches, run, crash_batch_idx,
                           arm_crash, monkeypatch):
    """Ingest all batches; at ``crash_batch_idx`` the injected crash
    fires and the batch is REPLAYED with the same batch_id. Returns the
    final corpus frame."""
    cur = corpus
    for i, b in enumerate(batches):
        bid = f"b{i}"
        if i == crash_batch_idx:
            undo = arm_crash(monkeypatch)
            with pytest.raises(RuntimeError, match="injected"):
                run(b, cur, bid)
            undo()
            r = run(b, cur, bid)  # the at-least-once replay
        else:
            r = run(b, cur, bid)
        assert r.n_accepted > 0
        cur = cur.union(r.accepted.select("doc_id", "text")).localCheckpoint()
    return cur


def test_crash_between_nd_and_bm25_updates(loop, monkeypatch):
    """Point A: the near-dup fold landed, BM25 never ran. The replay
    must skip the ND append (guarded), apply BM25, and re-return the
    SAME accepted rows (the half-indexed docs must not be rejected as
    near-dups of themselves — the exact-verify stage drops pairs whose
    corpus side has no text row)."""
    spark, corpus, batches, run, check = loop

    def arm(mp):
        real = text.update_bm25_index

        def boom(*a, **kw):
            raise RuntimeError("injected after ND update")

        mp.setattr(text, "update_bm25_index", boom)
        return lambda: mp.setattr(text, "update_bm25_index", real)

    final = _ingest_all_with_crash(spark, corpus, batches, run, 1, arm,
                                   monkeypatch)
    check(final)


def test_crash_between_bm25_postings_and_stats_commit(loop, monkeypatch):
    """Point B: postings appended, stats commit lost — the exact
    two-write window the r6 verdict asked closed. The replay must see
    the landed intent (file listing differs from the snapshot), roll
    the stats forward from it, and NOT re-append the postings."""
    spark, corpus, batches, run, check = loop

    def arm(mp):
        real = text._write_bm25_stats

        def crash_on_commit(spark_, table, n_total, avgdl, applied, pending,
                            migrate):
            if pending is None:  # the post-append commit call
                raise RuntimeError("injected between BM25 writes")
            return real(spark_, table, n_total, avgdl, applied, pending,
                        migrate)

        mp.setattr(text, "_write_bm25_stats", crash_on_commit)
        return lambda: mp.setattr(text, "_write_bm25_stats", real)

    final = _ingest_all_with_crash(spark, corpus, batches, run, 1, arm,
                                   monkeypatch)
    check(final)


def test_crash_between_nd_intent_and_append(loop, monkeypatch):
    """Point C: the near-dup intent is recorded but the signature
    append never ran. The replay must observe the unchanged file
    listing, drop the stale intent, and redo the append."""
    spark, corpus, batches, run, check = loop

    def arm(mp):
        real = indexes.guarded_append

        def crash_after_intent(spark_, table, batch_id, do_append):
            def no_append():
                raise RuntimeError("injected before ND append")

            return real(spark_, table, batch_id, no_append)

        mp.setattr(indexes, "guarded_append", crash_after_intent)
        return lambda: mp.setattr(indexes, "guarded_append", real)

    final = _ingest_all_with_crash(spark, corpus, batches, run, 1, arm,
                                   monkeypatch)
    check(final)


def test_crash_between_nd_append_and_meta_commit(loop, monkeypatch):
    """Point D: the near-dup append landed but the meta commit lost.
    The replay reconciles through the file-listing probe: append
    skipped, id marked applied — no duplicate signature rows (the r6
    advisor's double-append)."""
    spark, corpus, batches, run, check = loop

    def arm(mp):
        real = indexes.write_index_meta
        state = {"writes": 0}

        def crash_on_commit(spark_, table, applied, pending):
            if pending is None and state["writes"] > 0:
                raise RuntimeError("injected between ND writes")
            state["writes"] += 1
            return real(spark_, table, applied, pending)

        mp.setattr(indexes, "write_index_meta", crash_on_commit)
        return lambda: mp.setattr(indexes, "write_index_meta", real)

    final = _ingest_all_with_crash(spark, corpus, batches, run, 1, arm,
                                   monkeypatch)
    check(final)


def test_plain_replay_is_a_noop(loop):
    """A full replay of a COMPLETED batch (same batch_id) must change
    neither index nor the stats."""
    spark, corpus, batches, run, check = loop
    r = run(batches[0], corpus, "b0")
    assert r.n_accepted > 0
    nd_before = spark.table(ND).count()
    stats_before = spark.table(f"{BM}_stats").collect()[0]
    bm_before = spark.table(BM).count()

    r2 = run(batches[0], corpus, "b0")  # replay
    assert spark.table(ND).count() == nd_before
    assert spark.table(BM).count() == bm_before
    stats_after = spark.table(f"{BM}_stats").collect()[0]
    assert stats_after["_n_total"] == stats_before["_n_total"]
    assert stats_after["_batches"] == stats_before["_batches"]
    final = corpus.union(r2.accepted.select("doc_id", "text")).localCheckpoint()
    check(final)


def test_crash_emptying_bm25_stats_table_no_reappend(loop, monkeypatch):
    """Point E (r7 verdict task 5): the stats COMMIT rewrite is a tiny
    non-atomic Spark overwrite — a crash inside it can leave the table
    EMPTY, which used to reset the applied ring so a replay of exactly
    that batch re-appended its postings. The applied-marker file
    (claimed atomically between the append and the rewrite) must now
    make the replay a no-op append-wise, with totals rebuilt exactly
    from the postings."""
    spark, corpus, batches, run, check = loop

    def arm(mp):
        real = text._write_bm25_stats

        def crash_mid_rewrite(spark_, table, n_total, avgdl, applied,
                              pending, migrate):
            if pending is None:  # the post-append commit call
                # simulate the half-done overwrite: table left empty
                spark_.createDataFrame([], text._STATS_SCHEMA).write.mode(
                    "overwrite"
                ).insertInto(f"{table}_stats", overwrite=True)
                raise RuntimeError("injected inside stats rewrite")
            return real(spark_, table, n_total, avgdl, applied, pending,
                        migrate)

        mp.setattr(text, "_write_bm25_stats", crash_mid_rewrite)
        return lambda: mp.setattr(text, "_write_bm25_stats", real)

    final = _ingest_all_with_crash(spark, corpus, batches, run, 1, arm,
                                   monkeypatch)
    check(final)


def test_crash_emptying_nd_meta_table_no_reappend(loop, monkeypatch):
    """Point F: same residual for guarded_append's one-row
    ``<table>_meta`` — a crash that empties it mid-COMMIT loses the
    ring, but the applied-marker file must stop the replay from
    double-appending the batch's signatures."""
    spark, corpus, batches, run, check = loop

    def arm(mp):
        real = indexes.write_index_meta
        state = {"writes": 0}

        def crash_mid_rewrite(spark_, table, applied, pending):
            if pending is None and state["writes"] > 0:
                spark_.createDataFrame([], indexes._META_SCHEMA).write.mode(
                    "overwrite"
                ).insertInto(f"{table}_meta", overwrite=True)
                raise RuntimeError("injected inside meta rewrite")
            state["writes"] += 1
            return real(spark_, table, applied, pending)

        mp.setattr(indexes, "write_index_meta", crash_mid_rewrite)
        return lambda: mp.setattr(indexes, "write_index_meta", real)

    final = _ingest_all_with_crash(spark, corpus, batches, run, 1, arm,
                                   monkeypatch)
    check(final)


def test_compact_under_open_intent_does_not_drop_batch(loop, monkeypatch,
                                                       tmp_path):
    """ADVICE r8: a never-landed intent + a file-layout change between
    the crash and the replay used to make the landed probe misread the
    dead append as landed — silently dropping the batch. compact_index
    now settles the intent first, so the replay redoes the append."""
    spark, corpus, batches, run, check = loop
    cur = corpus
    r = run(batches[0], cur, "b0")
    cur = cur.union(r.accepted.select("doc_id", "text")).localCheckpoint()

    # crash batch b1 between the ND intent write and its append
    real = indexes.guarded_append

    def crash_after_intent(spark_, table, batch_id, do_append):
        def no_append():
            raise RuntimeError("injected before ND append")

        return real(spark_, table, batch_id, no_append)

    monkeypatch.setattr(indexes, "guarded_append", crash_after_intent)
    with pytest.raises(RuntimeError, match="injected"):
        run(batches[1], cur, "b1")
    monkeypatch.undo()

    # the layout change lands BEFORE the replay
    indexes.compact_index(spark, ND, str(tmp_path / "nd-compacted"))

    r = run(batches[1], cur, "b1")  # replay must redo the append
    assert r.n_accepted > 0
    cur = cur.union(r.accepted.select("doc_id", "text")).localCheckpoint()
    r = run(batches[2], cur, "b2")
    cur = cur.union(r.accepted.select("doc_id", "text")).localCheckpoint()
    check(cur)


def _disk_loss(spark, table, *paths):
    """Simulate losing one index's disk: remove its files AND its
    catalog entries (external-table DROP deletes nothing, so both are
    needed for a true loss)."""
    import shutil

    for t in (table, f"{table}_meta", f"{table}_stats"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)


def test_restore_lost_bm25_index(loop, tmp_path):
    """Disaster drill (r7 verdict task 2), BM25 arm: after a completed
    batch, the BM25 index's disk is lost entirely; restore_lost_index
    rebuilds it from the accepted-corpus parquet, seeds the applied
    ring from the surviving near-dup twin, the rebuilt index answers
    queries identically to a fresh lineage, a replay of the last batch
    folds nothing, and the loop resumes cleanly."""
    spark, corpus, batches, run, check = loop
    r1 = run(batches[0], corpus, "r1")
    assert r1.n_accepted > 0
    corpus2 = corpus.union(
        r1.accepted.select("doc_id", "text")
    ).localCheckpoint()

    _disk_loss(
        spark, BM,
        str(tmp_path / "bm"), str(tmp_path / "bm_stats"),
        str(tmp_path / "bm_stats_markers"),
    )
    seeded = ingest.restore_lost_index(
        spark, BM, "bm25", corpus2, str(tmp_path / "bm"),
        surviving_table=ND, buckets=8,
    )
    assert seeded == ["r1"]
    assert spark.table(f"{BM}_stats").collect()[0]["_batches"] == ["r1"]
    check(corpus2)  # rebuilt ≡ fresh reference lineage, both indexes

    # replay of the restored batch: nothing folds twice
    bm_rows = spark.table(BM).count()
    run(batches[0], corpus2, "r1")
    assert spark.table(BM).count() == bm_rows
    assert spark.table(f"{BM}_stats").collect()[0]["_n_total"] == \
        corpus2.count()

    # resume the loop
    r2 = run(batches[1], corpus2, "r2")
    assert r2.n_accepted > 0
    final = corpus2.union(
        r2.accepted.select("doc_id", "text")
    ).localCheckpoint()
    check(final)


def test_restore_lost_neardup_index(loop, tmp_path):
    """Disaster drill, near-dup arm: lose the LSH index's disk, restore
    from the corpus seeded from the surviving BM25 twin's _batches
    ring, verify rebuilt ≡ fresh lineage, corpus-resubmission rejection
    still works, and the loop resumes."""
    spark, corpus, batches, run, check = loop
    r1 = run(batches[0], corpus, "n1")
    assert r1.n_accepted > 0
    corpus2 = corpus.union(
        r1.accepted.select("doc_id", "text")
    ).localCheckpoint()

    _disk_loss(
        spark, ND,
        str(tmp_path / "nd"), str(tmp_path / "nd_meta"),
        str(tmp_path / "nd_meta_markers"),
    )
    seeded = ingest.restore_lost_index(
        spark, ND, "near_dup", corpus2, str(tmp_path / "nd"),
        surviving_table=BM, rows=4, buckets=8,
    )
    assert seeded == ["n1"]
    assert indexes.read_index_meta(spark, ND)[0] == ["n1"]
    check(corpus2)

    # the restored index still rejects corpus re-submissions and the
    # replay-detection ring still recognizes n1
    resub = (
        r1.accepted.orderBy("doc_id").limit(2)
        .select((F.col("doc_id") + 5_000_000).alias("doc_id"), "text")
    )
    r2 = run(batches[1].union(resub), corpus2, "n2")
    acc2 = {r["doc_id"] for r in r2.accepted.collect()}
    assert not {r["doc_id"] for r in resub.collect()} & acc2
    final = corpus2.union(
        r2.accepted.select("doc_id", "text")
    ).localCheckpoint()
    check(final)


def _with_vec(df, dims=8):
    """Deterministic pseudo-embedding per doc id (the loop never runs
    a model; embeddings arrive on the batch)."""
    return df.withColumn(
        "embedding",
        F.array(*[
            (F.pmod(F.hash(F.col("doc_id") + F.lit(i)), F.lit(1000))
             .cast("float") / 500.0 - 1.0)
            for i in range(dims)
        ]),
    )


def _ivf_equals_frozen_assignment(spark, table, corpus_vecs):
    """The incremental-IVF equality harness: index content must equal
    assigning every corpus vector against the index's (frozen)
    centroids."""
    from pufs_spark.operators import similarity

    cent = spark.table(f"{table}_centroids")
    want = {
        (r["doc_id"], r["centroid_id"])
        for r in similarity._assign_to_centroids(
            corpus_vecs.select("doc_id", "embedding"),
            cent, "doc_id", "embedding", "doc_id", 1,
        ).select("doc_id", "centroid_id").collect()
    }
    got = {
        (r["doc_id"], r["centroid_id"])
        for r in spark.table(table).select("doc_id", "centroid_id").collect()
    }
    assert got == want and got


def test_three_index_loop_crash_before_ann_fold(spark, tmp_path, monkeypatch):
    """The loop's THIRD guarded fold (ann_table): a crash strictly
    between the BM25 fold and the IVF fold replays to a state where
    ND and BM25 skip (rings) and the IVF append applies exactly once —
    index ≡ frozen-centroid assignment of the final corpus, drift log
    has exactly one row per applied batch, no duplicates."""
    from pufs_spark.operators import similarity

    docs = _with_vec(
        load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    )
    corpus = docs.where(F.col("doc_id") < 60).cache()
    b0 = docs.where((F.col("doc_id") >= 60) & (F.col("doc_id") < 80))
    b1 = docs.where((F.col("doc_id") >= 80) & (F.col("doc_id") < 100))
    for t in ("tri_nd", "tri_nd_meta", "tri_bm", "tri_bm_stats", "tri_ann",
              "tri_ann_meta", "tri_ann_centroids", "tri_ann_drift",
              "tri_ref", "tri_ref_stats"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    dedup.build_near_dup_index(corpus, "tri_nd", str(tmp_path / "nd"),
                               rows=4, buckets=8)
    text.build_bm25_index(corpus, "tri_bm", str(tmp_path / "bm"), buckets=8)
    similarity.build_ann_index(
        corpus.select("doc_id", "embedding"), "tri_ann",
        str(tmp_path / "ann"), n_centroids=4, id_col="doc_id", buckets=4,
    )

    def run(batch, corpus_now, bid):
        return ingest.ingest_corpus_batch(
            batch, corpus_now, "tri_nd", "tri_bm", str(tmp_path / "bm"),
            rows=4, batch_id=bid, skip_clean=True,
            ann_table="tri_ann", id_col="doc_id",
        )

    try:
        r0 = run(b0, corpus, "t0")
        assert r0.n_accepted > 0
        corpus1 = corpus.union(r0.accepted.select(*corpus.columns)) \
            .localCheckpoint()

        # crash strictly between the BM25 fold and the ANN fold
        real = similarity.update_ann_index

        def boom(*a, **kw):
            raise RuntimeError("injected before ANN fold")

        monkeypatch.setattr(similarity, "update_ann_index", boom)
        with pytest.raises(RuntimeError, match="injected"):
            run(b1, corpus1, "t1")
        monkeypatch.setattr(similarity, "update_ann_index", real)
        r1 = run(b1, corpus1, "t1")  # at-least-once replay
        assert r1.n_accepted > 0
        final = corpus1.union(r1.accepted.select(*corpus.columns)) \
            .localCheckpoint()

        _ivf_equals_frozen_assignment(spark, "tri_ann", final)
        # the text twins converged too (rings skipped their replays)
        s = spark.table("tri_bm_stats").collect()[0]
        assert s["_n_total"] == final.count()
        assert s["_batches"] == ["t0", "t1"]
        # drift log: one row per applied batch, ordered, no dupes
        drift = {r["batch_id"] for r in spark.table("tri_ann_drift").collect()}
        assert drift == {"__build__", "t0", "t1"}
        assert spark.table("tri_ann_drift").count() == 3

        # full replay of a completed batch: nothing moves anywhere
        ann_rows = spark.table("tri_ann").count()
        run(b1, final, "t1")
        assert spark.table("tri_ann").count() == ann_rows
        assert spark.table("tri_ann_drift").count() == 3
    finally:
        for t in ("tri_nd", "tri_nd_meta", "tri_bm", "tri_bm_stats",
                  "tri_ann", "tri_ann_meta", "tri_ann_centroids",
                  "tri_ann_drift", "tri_ref", "tri_ref_stats"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_restore_lost_ivf_index(spark, tmp_path):
    """Disaster drill, IVF arm: lose the ANN index's disk (inverted
    lists, centroids, drift log, meta), restore via retrain over the
    accepted corpus seeded from the surviving ND twin's ring, verify
    self-consistency (index ≡ assignment against the NEW centroids +
    fresh drift baseline), and resume the loop."""
    from pufs_spark.operators import similarity

    docs = _with_vec(
        load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    )
    corpus = docs.where(F.col("doc_id") < 60).cache()
    b0 = docs.where((F.col("doc_id") >= 60) & (F.col("doc_id") < 80))
    b1 = docs.where((F.col("doc_id") >= 80) & (F.col("doc_id") < 100))
    tables = ("ri_nd", "ri_nd_meta", "ri_bm", "ri_bm_stats", "ri_ann",
              "ri_ann_meta", "ri_ann_centroids", "ri_ann_drift")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    dedup.build_near_dup_index(corpus, "ri_nd", str(tmp_path / "nd"),
                               rows=4, buckets=8)
    text.build_bm25_index(corpus, "ri_bm", str(tmp_path / "bm"), buckets=8)
    similarity.build_ann_index(
        corpus.select("doc_id", "embedding"), "ri_ann",
        str(tmp_path / "ann"), n_centroids=4, id_col="doc_id", buckets=4,
    )

    def run(batch, corpus_now, bid):
        return ingest.ingest_corpus_batch(
            batch, corpus_now, "ri_nd", "ri_bm", str(tmp_path / "bm"),
            rows=4, batch_id=bid, skip_clean=True,
            ann_table="ri_ann", id_col="doc_id",
        )

    try:
        r0 = run(b0, corpus, "v0")
        assert r0.n_accepted > 0
        corpus1 = corpus.union(r0.accepted.select(*corpus.columns)) \
            .localCheckpoint()

        _disk_loss(
            spark, "ri_ann",
            str(tmp_path / "ann"), str(tmp_path / "ann_centroids"),
            str(tmp_path / "ann_drift"), str(tmp_path / "ann_meta"),
            str(tmp_path / "ann_meta_markers"),
        )
        spark.sql("DROP TABLE IF EXISTS ri_ann_centroids")
        spark.sql("DROP TABLE IF EXISTS ri_ann_drift")
        seeded = ingest.restore_lost_index(
            spark, "ri_ann", "ivf",
            corpus1.select("doc_id", "embedding"),
            str(tmp_path / "ann"), surviving_table="ri_nd",
            id_col="doc_id", n_centroids=4, ivf_buckets=4,
        )
        assert seeded == ["v0"]
        _ivf_equals_frozen_assignment(spark, "ri_ann", corpus1)
        base = spark.table("ri_ann_drift").collect()
        assert [r["batch_id"] for r in base] == ["__build__"]

        # a replay of v0 folds nothing (seeded ring + marker files)
        ann_rows = spark.table("ri_ann").count()
        run(b0, corpus1, "v0")
        assert spark.table("ri_ann").count() == ann_rows

        # resume
        r1 = run(b1, corpus1, "v1")
        assert r1.n_accepted > 0
        final = corpus1.union(r1.accepted.select(*corpus.columns)) \
            .localCheckpoint()
        _ivf_equals_frozen_assignment(spark, "ri_ann", final)
        assert {r["batch_id"] for r in spark.table("ri_ann_drift").collect()} \
            == {"__build__", "v1"}
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
