"""The standing-ingest-service loop (operators/ingest.py), end to end
over two batches: corpus-duplicate rejection through the persisted LSH
index, within-batch dedup, index growth between batches, BM25
consistency vs a fresh one-shot build at every step, and in-place
compaction mid-loop (a post-compact batch must still fold in
correctly)."""

import pytest

from pyspark.sql import functions as F

from pufs_spark.operators import dedup, indexes, ingest, text
from pufs_spark.tables import load_table
from tests.conftest import SF_DIR

ND, BM = "ing_nd", "ing_bm"


@pytest.fixture(scope="module")
def corpus_batches(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") < 60).cache()
    fresh1 = docs.where((F.col("doc_id") >= 60) & (F.col("doc_id") < 90))
    fresh2 = docs.where((F.col("doc_id") >= 90) & (F.col("doc_id") < 120))
    return corpus, fresh1, fresh2


def _copies(df, id_shift, n):
    """n docs of df re-submitted under fresh ids (exact duplicates)."""
    return (
        df.orderBy("doc_id").limit(n)
        .select((F.col("doc_id") + id_shift).alias("doc_id"), "text")
    )


def _drop(spark):
    for t in (ND, f"{ND}_meta", BM, f"{BM}_stats", "ing_ref",
              "ing_ref_stats", "ing_ref_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.mark.soak  # multi-minute; see pytest.ini
def test_ingest_loop_two_batches_with_compaction(
    spark, corpus_batches, tmp_path_factory
):
    corpus, fresh1, fresh2 = corpus_batches
    wh = tmp_path_factory.mktemp("ingest")
    _drop(spark)
    dedup.build_near_dup_index(corpus, ND, str(wh / "nd"), rows=4, buckets=8)
    text.build_bm25_index(corpus, BM, str(wh / "bm"), buckets=8)
    try:
        # batch 1: fresh docs + 3 corpus re-submissions under new ids
        # + an exact within-batch duplicate pair (two new ids, same text)
        dup_pair = (
            fresh1.orderBy("doc_id").limit(1)
            .select(F.lit(900001).alias("doc_id"), "text")
            .union(
                fresh1.orderBy("doc_id").limit(1)
                .select(F.lit(900002).alias("doc_id"), "text")
            )
        )
        batch1 = fresh1.union(_copies(corpus, 1_000_000, 3)).union(dup_pair)
        r1 = ingest.ingest_corpus_batch(
            batch1, corpus, ND, BM, str(wh / "bm"),
            rows=4, batch_id="b1", skip_clean=True,
        )
        acc1 = {r["doc_id"] for r in r1.accepted.collect()}
        # corpus re-submissions rejected through the index
        assert not acc1 & {1_000_000 + i for i in range(60)}
        # within-batch exact pair: min id survives, max id doesn't —
        # unless its text near-dups the corpus (then both are gone)
        assert 900002 not in acc1
        assert r1.n_accepted == len(acc1) > 0

        corpus2 = corpus.union(r1.accepted.select("doc_id", "text")).cache()

        # batch 2: fresh docs + re-submissions of batch-1 ACCEPTED docs
        # (proves update_near_dup_index made them visible to dedup)
        resub = (
            r1.accepted.orderBy("doc_id").limit(3)
            .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
        )
        batch2 = fresh2.union(resub)
        r2 = ingest.ingest_corpus_batch(
            batch2, corpus2, ND, BM, str(wh / "bm"),
            rows=4, batch_id="b2", skip_clean=True,
            max_files_per_bucket=1,        # force compaction this turn
        )
        acc2 = {r["doc_id"] for r in r2.accepted.collect()}
        assert not acc2 & {2_000_000 + i for i in acc1}
        assert r2.compacted, "file-count trigger should have fired"
        for t in r2.compacted:
            assert indexes.index_file_count(spark, t) <= 8

        # BM25 stats walked forward exactly
        stats = spark.table(f"{BM}_stats").collect()[0]
        final = corpus2.union(r2.accepted.select("doc_id", "text")).cache()
        assert stats["_n_total"] == final.count()
        assert stats["_batches"] == ["b1", "b2"]

        # grown+compacted index ≡ fresh one-shot build over the same corpus
        text.build_bm25_index(final, "ing_ref", str(wh / "ref"), buckets=8)
        q = ["spark", "join", "window"]
        got = {
            r["doc_id"]: r["score"]
            for r in text.bm25_search(final, q, corpus_index=BM).collect()
        }
        want = {
            r["doc_id"]: r["score"]
            for r in text.bm25_search(final, q, corpus_index="ing_ref").collect()
        }
        assert set(got) == set(want) and got
        for kk in got:
            assert got[kk] == pytest.approx(want[kk], rel=1e-9)

        # post-compact fold still works: one more tiny batch ingests
        batch3 = (
            fresh2.orderBy("doc_id").limit(1)
            .select(F.lit(3_000_000).alias("doc_id"),
                    F.concat(F.lit("entirely novel text about quasars "),
                             F.col("text")).alias("text"))
        )
        r3 = ingest.ingest_corpus_batch(
            batch3, final, ND, BM, str(wh / "bm"),
            rows=4, batch_id="b3", skip_clean=True,
        )
        assert r3.n_accepted <= 1
    finally:
        _drop(spark)


@pytest.mark.soak  # multi-minute; see pytest.ini
def test_ingest_clean_gates_apply(spark, corpus_batches, tmp_path_factory):
    """skip_clean=False runs the quality/language gates before any
    index work — garbage rows never reach the dedup stages."""
    corpus, fresh1, _ = corpus_batches
    wh = tmp_path_factory.mktemp("ingest_clean")
    _drop(spark)
    dedup.build_near_dup_index(corpus, ND, str(wh / "nd"), rows=4, buckets=8)
    text.build_bm25_index(corpus, BM, str(wh / "bm"), buckets=8)
    try:
        junk = spark.createDataFrame(
            [(800001, "!!! ??? ..."), (800002, "a b")],
            "doc_id long, text string",
        )
        r = ingest.ingest_corpus_batch(
            fresh1.union(junk), corpus, ND, BM, str(wh / "bm"),
            rows=4, batch_id="c1",
        )
        acc = {row["doc_id"] for row in r.accepted.collect()}
        assert not acc & {800001, 800002}
        assert r.n_after_clean < r.n_in
    finally:
        _drop(spark)


@pytest.mark.soak  # multi-minute; see pytest.ini
def test_ingest_rejects_id_collision_but_allows_replay(
    spark, corpus_batches, tmp_path_factory
):
    """The id-freshness contract is enforced (r7 verdict task 3): a
    batch whose accepted ids already live in the near-dup index raises
    BatchIdCollisionError BEFORE any fold (neither index moves), while
    a replay of an already-applied batch_id sails through (its
    collisions are its own prior application)."""
    corpus, fresh1, _ = corpus_batches
    wh = tmp_path_factory.mktemp("ingest_ids")
    _drop(spark)
    dedup.build_near_dup_index(corpus, ND, str(wh / "nd"), rows=4, buckets=8)
    text.build_bm25_index(corpus, BM, str(wh / "bm"), buckets=8)
    try:
        r1 = ingest.ingest_corpus_batch(
            fresh1, corpus, ND, BM, str(wh / "bm"),
            rows=4, batch_id="f1", skip_clean=True,
        )
        assert r1.n_accepted > 0
        corpus2 = corpus.union(r1.accepted.select("doc_id", "text")).cache()
        nd_rows = spark.table(ND).count()
        bm_stats = spark.table(f"{BM}_stats").collect()[0]

        # replay of the SAME batch under its applied batch_id: legal,
        # and the guarded folds no-op (indexes unchanged)
        ingest.ingest_corpus_batch(
            fresh1, corpus2, ND, BM, str(wh / "bm"),
            rows=4, batch_id="f1", skip_clean=True,
        )
        assert spark.table(ND).count() == nd_rows
        assert spark.table(f"{BM}_stats").collect()[0]["_n_total"] == \
            bm_stats["_n_total"]

        # a NEW batch_id re-submitting an already-indexed id with
        # DIFFERENT text (so no dedup stage catches it): must raise,
        # and must raise before either index moved
        colliding_id = r1.accepted.orderBy("doc_id").limit(1).collect()[0][
            "doc_id"
        ]
        bad = spark.createDataFrame(
            [(colliding_id, "totally new words the index never saw")],
            "doc_id long, text string",
        )
        with pytest.raises(ingest.BatchIdCollisionError, match=str(colliding_id)):
            ingest.ingest_corpus_batch(
                bad, corpus2, ND, BM, str(wh / "bm"),
                rows=4, batch_id="f2", skip_clean=True,
            )
        assert spark.table(ND).count() == nd_rows
        assert spark.table(f"{BM}_stats").collect()[0]["_batches"] == ["f1"]

        # opt-out for trusted feeds: same batch folds when disabled
        # (documented corruption risk is the caller's)
        r3 = ingest.ingest_corpus_batch(
            bad, corpus2, ND, BM, str(wh / "bm"),
            rows=4, batch_id="f3", skip_clean=True,
            check_id_freshness=False,
        )
        assert r3.n_accepted == 1
    finally:
        _drop(spark)
