"""The whole streaming ingest product loop, soaked end to end:

    file stream → stream_clean_corpus (stateless gates + bounded-state
    exact dedup across micro-batches) → foreachBatch →
    ingest_corpus_batch (near-dup vs the persisted LSH index,
    within-batch dedup, fold into both indexes) → accepted parquet

over two feed waves with every failure mode represented: junk rows
(gate), an exact redelivery across waves (stream dedup), corpus
re-submissions under fresh ids (index rejection), and re-submissions
of wave-1 ACCEPTED docs in wave 2 (index growth). The pieces are each
tested alone; this pins the composition the ROADMAP called a soak."""

import os

import pytest

from pyspark.sql import functions as F

from pufs_spark.operators import dedup, ingest, pipeline, text
from pufs_spark.tables import load_table
from tests.conftest import SF_DIR

ND, BM = "sing_nd", "sing_bm"


def _drop(spark):
    for t in (ND, f"{ND}_meta", BM, f"{BM}_stats"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_streaming_ingest_loop(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") < 60).cache()
    fresh1 = docs.where((F.col("doc_id") >= 60) & (F.col("doc_id") < 80))
    fresh2 = docs.where((F.col("doc_id") >= 80) & (F.col("doc_id") < 100))

    feed = str(tmp_path / "feed")
    accepted_dir = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)
    _drop(spark)
    dedup.build_near_dup_index(corpus, ND, str(tmp_path / "nd"), rows=4, buckets=8)
    text.build_bm25_index(corpus, BM, str(tmp_path / "bm"), buckets=8)

    def corpus_now():
        base = corpus
        if os.path.isdir(accepted_dir) and any(
            f.endswith(".parquet") for f in os.listdir(accepted_dir)
        ):
            base = base.union(
                spark.read.parquet(accepted_dir).select("doc_id", "text")
            )
        return base

    def fold(batch_df, batch_id):
        batch = batch_df.select("doc_id", "text")
        if not batch.take(1):
            return
        r = ingest.ingest_corpus_batch(
            batch, corpus_now(), ND, BM, str(tmp_path / "bm"),
            rows=4, batch_id=f"epoch-{batch_id}", skip_clean=True,
        )
        if r.n_accepted:
            r.accepted.write.mode("append").parquet(accepted_dir)

    def drain():
        stream = (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .parquet(feed)
        )
        cleaned = pipeline.stream_clean_corpus(
            stream, lang=None, min_tokens=3
        )
        q = (
            cleaned.writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    ts = F.current_timestamp()

    # wave 1: fresh docs + 2 corpus re-submissions under fresh ids +
    # junk that must die at the gates + a doc that will be redelivered
    wave1 = (
        fresh1.withColumn("ts", ts)
        .union(
            corpus.orderBy("doc_id").limit(2)
            .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
            .withColumn("ts", ts)
        )
        .union(
            spark.createDataFrame(
                [(700001, "!!! ???"), (700002, "x")],
                "doc_id long, text string",
            ).withColumn("ts", ts)
        )
    )
    wave1.write.mode("append").parquet(feed)
    drain()

    acc1 = spark.read.parquet(accepted_dir)
    acc1_ids = {r["doc_id"] for r in acc1.collect()}
    assert acc1_ids and acc1_ids <= {r["doc_id"] for r in fresh1.collect()}
    assert not acc1_ids & {1_000_000, 1_000_001, 700001, 700002}

    # wave 2: fresh docs + EXACT redelivery of a wave-1 row (same id,
    # same text — the stream's bounded-state dedup must drop it before
    # it ever reaches the fold) + re-submissions of wave-1 accepted
    # docs under fresh ids (the index fold must reject them)
    redelivered = fresh1.orderBy("doc_id").limit(1).withColumn("ts", ts)
    resub = (
        acc1.orderBy("doc_id").limit(2)
        .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
        .withColumn("ts", ts)
    )
    wave2 = fresh2.withColumn("ts", ts).union(redelivered).union(resub)
    wave2.write.mode("append").parquet(feed)
    drain()

    final = spark.read.parquet(accepted_dir)
    final_ids = {r["doc_id"] for r in final.collect()}
    # wave-1 accepted docs were not re-accepted under their new ids
    assert not final_ids & {i + 2_000_000 for i in acc1_ids}
    # the redelivered row appears exactly once
    redel_id = redelivered.collect()[0]["doc_id"]
    assert sum(1 for i in final_ids if i == redel_id) <= 1
    assert final.groupBy("doc_id").count().where("count > 1").count() == 0

    # BM25 stats walked the accepted corpus exactly, batch ids recorded
    stats = spark.table(f"{BM}_stats").collect()[0]
    assert stats["_n_total"] == 60 + final.count()
    assert all(b.startswith("epoch-") for b in stats["_batches"])

    # the loop's invariant: probing the final accepted set against the
    # (now fully folded) index finds ONLY self-pairs — no accepted doc
    # near-duplicates the corpus or another accepted doc at the ingest
    # threshold
    leftover = dedup.cross_near_dup_pairs(
        final.select("doc_id", "text"), corpus_now(), 0.7,
        rows=4, corpus_index=ND,
    )
    assert leftover.where(F.col("a") != F.col("b")).count() == 0
    _drop(spark)


def test_streaming_kill_resume_mid_batch(spark, tmp_path, monkeypatch):
    """The r6 verdict's streaming-replay soak, at the streaming seam:
    the foreachBatch worker dies MID-BATCH (after the near-dup fold,
    before the BM25 fold — the worst split), the query errors out, and
    a restart from the same checkpoint replays the SAME epoch id. The
    per-index commit markers must turn the replay into exactly the
    missing work: ND append skipped, BM25 applied, accepted rows
    written once, both indexes equal to fresh one-shot builds."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") < 60).cache()
    fresh = docs.where((F.col("doc_id") >= 60) & (F.col("doc_id") < 90))

    feed = str(tmp_path / "feed")
    accepted_dir = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed)
    _drop(spark)
    spark.sql("DROP TABLE IF EXISTS sing_ref")
    spark.sql("DROP TABLE IF EXISTS sing_ref_stats")
    spark.sql("DROP TABLE IF EXISTS sing_refnd")
    dedup.build_near_dup_index(corpus, ND, str(tmp_path / "nd"), rows=4,
                               buckets=8)
    text.build_bm25_index(corpus, BM, str(tmp_path / "bm"), buckets=8)

    def corpus_now():
        base = corpus
        if os.path.isdir(accepted_dir) and any(
            f.endswith(".parquet") for f in os.listdir(accepted_dir)
        ):
            base = base.union(
                spark.read.parquet(accepted_dir).select("doc_id", "text")
            )
        return base

    def fold(batch_df, batch_id):
        batch = batch_df.select("doc_id", "text")
        if not batch.take(1):
            return
        r = ingest.ingest_corpus_batch(
            batch, corpus_now(), ND, BM, str(tmp_path / "bm"),
            rows=4, batch_id=f"epoch-{batch_id}", skip_clean=True,
        )
        if r.n_accepted:
            r.accepted.write.mode("append").parquet(accepted_dir)

    def drain():
        stream = (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .parquet(feed)
        )
        q = (
            stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return q

    fresh.withColumn("ts", F.current_timestamp()).write.mode("append").parquet(feed)

    # arm the mid-batch death: ND fold lands, BM25 never runs
    real_update = text.update_bm25_index

    def die(*a, **kw):
        raise RuntimeError("worker died mid-batch")

    monkeypatch.setattr(text, "update_bm25_index", die)
    with pytest.raises(Exception, match="worker died mid-batch"):
        drain()
    monkeypatch.setattr(text, "update_bm25_index", real_update)

    # resume from the SAME checkpoint: Spark replays the same epoch
    drain()

    final = spark.read.parquet(accepted_dir)
    assert final.groupBy("doc_id").count().where("count > 1").count() == 0
    n_final = final.count()
    assert n_final > 0

    stats = spark.table(f"{BM}_stats").collect()[0]
    assert stats["_n_total"] == 60 + n_final
    assert stats["_pending"] is None
    assert len(stats["_batches"]) == 1  # one epoch, applied exactly once

    # both indexes ≡ fresh builds over the final corpus
    full = corpus.union(final.select("doc_id", "text")).localCheckpoint()
    text.build_bm25_index(full, "sing_ref", str(tmp_path / "ref"), buckets=8)
    q = ["spark", "join", "window"]
    got = {r["doc_id"]: r["score"]
           for r in text.bm25_search(full, q, corpus_index=BM).collect()}
    want = {r["doc_id"]: r["score"]
            for r in text.bm25_search(full, q, corpus_index="sing_ref").collect()}
    assert set(got) == set(want) and got
    for k in got:
        assert got[k] == pytest.approx(want[k], rel=1e-9)
    dedup.build_near_dup_index(full, "sing_refnd", str(tmp_path / "refnd"),
                               rows=4, buckets=8)
    cols = ["doc_id", "band", "key"]
    assert (
        {tuple(r) for r in spark.table(ND).select(cols).collect()}
        == {tuple(r) for r in spark.table("sing_refnd").select(cols).collect()}
    )
    _drop(spark)
    for t in ("sing_ref", "sing_ref_stats", "sing_refnd", "sing_refnd_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
