"""Structured Streaming tests: windowed rates over a file stream and
the custom stateful transfer tracker (applyInPandasWithState), both
driven to completion with availableNow triggers."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pufs_spark.streaming import monitor
from pufs_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """Events re-written as micro-second timestamps so the stream's
    declared schema matches (raw testdata parquet is TIMESTAMP(NANOS))."""
    spark = None  # resolved lazily via the session fixture in each test
    return str(tmp_path_factory.mktemp("events_stream"))


def _write_events(spark, path: str, n_files: int = 4) -> None:
    ev = load_table(spark, SF_DIR, "events")
    ev.repartition(n_files).write.mode("overwrite").parquet(path)


def _run_to_end(sdf, name: str):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("update" if name == "tstate" else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_rates_matches_batch(spark, events_dir):
    _write_events(spark, events_dir)
    sdf = monitor.stream_rates(spark, events_dir)
    q = _run_to_end(sdf, "rates")
    got = {
        (r["window"]["start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM rates").collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    expect = {
        (r["w"]["start"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.window("ts", "1 minute").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    q.stop()
    assert got == expect
    assert len(got) > 10


def test_stateful_transfer_status(spark, tmp_path):
    """Multi-batch stateful aggregation: state carries across
    micro-batches (maxFilesPerTrigger=1 forces several batches)."""
    ev = load_table(spark, SF_DIR, "events")
    te = ev.select(
        "ts",
        F.concat(F.lit("u_"), F.col("user_id") % 5).alias("bid"),
        F.col("value").alias("offset"),
    )
    path = str(tmp_path / "transfers")
    te.repartition(3).write.parquet(path)

    stream = (
        spark.readStream.schema("ts timestamp, bid string, offset double")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    sdf = monitor.stateful_transfer_status(stream)
    q = _run_to_end(sdf, "tstate")
    rows = spark.sql("SELECT * FROM tstate").collect()
    q.stop()

    # final snapshot per bid (monotone state: max n_events) == exact
    # batch aggregate
    last = {}
    for r in rows:
        if r["bid"] not in last or r["n_events"] > last[r["bid"]]["n_events"]:
            last[r["bid"]] = r
    expect = {
        r["bid"]: r
        for r in te.groupBy("bid")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("offset").alias("mn"),
            F.max("offset").alias("mx"),
        )
        .collect()
    }
    assert set(last) == set(expect)
    for bid, r in last.items():
        e = expect[bid]
        assert r["n_events"] == e["n_events"]
        assert r["min_offset"] == pytest.approx(e["mn"])
        assert r["max_offset"] == pytest.approx(e["mx"])
        assert r["bytes_moved"] == pytest.approx(e["mx"] - e["mn"])


def test_reservoir_sample_properties(spark):
    ev = load_table(spark, SF_DIR, "events")
    s1 = monitor.reservoir_sample(ev, k=50)
    s2 = monitor.reservoir_sample(ev, k=50)
    ids1 = sorted(r["event_id"] for r in s1.collect())
    ids2 = sorted(r["event_id"] for r in s2.collect())
    assert len(ids1) == 50
    assert ids1 == ids2  # deterministic given the seed
    all_ids = {r["event_id"] for r in ev.select("event_id").collect()}
    assert set(ids1) <= all_ids
    # loose uniformity: both halves of the id space represented
    mid = (min(all_ids) + max(all_ids)) / 2
    assert any(i < mid for i in ids1) and any(i >= mid for i in ids1)


def test_latency_percentiles_ordered(spark):
    ev = load_table(spark, SF_DIR, "events")
    for r in monitor.latency_percentiles(ev).collect():
        assert r["p50"] <= r["p90"] <= r["p99"]
        assert r["n"] > 0


def test_latency_percentiles_plans_no_global_sort(spark):
    """VERDICT r14 #5 — the production percentile API must stay a
    partial aggregate at any scale: map-side sketches, ONE hash
    exchange on the group key, no per-key global sort. The exact
    rank-window form (q_a2) is oracle/test-side only; this pins the
    demotion so a refactor can't silently reintroduce a sort."""
    ev = load_table(spark, SF_DIR, "events")
    plan = (
        monitor.latency_percentiles(ev)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "rangepartitioning" not in plan.lower()  # no global sort
    assert "Window" not in plan  # no rank machinery
    # partial aggregation proves the sketch merges map-side
    assert "partial_percentile_approx" in plan
    # exactly one exchange: the hash shuffle on the group key
    assert plan.count(") Exchange") == 1


def test_stateful_tracker_over_real_telemetry(spark, tmp_path):
    """End-to-end monitoring loop: ensure_cached's REAL telemetry
    segments (sources/sparse) drive the stateful streaming tracker —
    the producer and the T5 consumer wired together."""
    import os

    from pufs_spark.sources import sparse
    from pufs_spark.sources.remote import MemRemote

    remote = MemRemote()
    remote.blocks["blkA"] = bytes(500_000)
    remote.blocks["blkB"] = bytes(300_000)
    root = str(tmp_path / "cache")
    reqs = spark.createDataFrame(
        [("blkA", 0, 400_000), ("blkB", 0, 250_000)],
        "bid string, qstart long, qend long",
    )
    stats = sparse.ensure_cached(
        spark, root, lambda: remote, reqs, chunk_size=65536
    )
    assert stats["chunks_fetched"] > 0

    tdir = os.path.join(root, sparse.TRANSFER_LOG_DIR)
    stream = (
        spark.readStream.schema(
            "bid string, ts_us long, offset long, `end` long, "
            "bytes long, latency_ms double"
        )
        .parquet(tdir)
        .select(
            F.timestamp_micros(F.col("ts_us")).alias("ts"),
            "bid",
            F.col("offset").cast("double").alias("offset"),
        )
    )
    sdf = monitor.stateful_transfer_status(stream)
    q = _run_to_end(sdf, "tstate")
    rows = spark.sql("SELECT * FROM tstate").collect()
    q.stop()
    by_bid = {r["bid"]: r for r in rows}
    assert set(by_bid) == {"blkA", "blkB"}
    # every chunk of blkA was logged: max offset = last chunk start
    assert by_bid["blkA"]["max_offset"] >= 327680.0
    assert by_bid["blkA"]["n_events"] + by_bid["blkB"]["n_events"] == stats[
        "chunks_fetched"
    ]


def test_stream_dedup_drops_redeliveries(spark, tmp_path):
    """At-least-once delivery: the same (bid) keys re-delivered across
    files must come out exactly once, and state must be
    watermark-bounded (dropDuplicatesWithinWatermark, not the
    unbounded dropDuplicates)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    tdir = str(tmp_path / "dedup_in")
    os.makedirs(tdir)
    base = 1_700_000_000_000_000
    # file 1: keys a,b,c; file 2 re-delivers b,c (within watermark) + d
    pq.write_table(
        pa.table({
            "ts_us": pa.array([base, base + 1_000_000, base + 2_000_000],
                              pa.int64()),
            "bid": ["a", "b", "c"],
        }),
        os.path.join(tdir, "f1.parquet"),
    )
    pq.write_table(
        pa.table({
            "ts_us": pa.array(
                [base + 3_000_000, base + 4_000_000, base + 5_000_000],
                pa.int64()),
            "bid": ["b", "c", "d"],
        }),
        os.path.join(tdir, "f2.parquet"),
    )
    stream = (
        spark.readStream.schema("ts_us long, bid string")
        .option("maxFilesPerTrigger", 1)
        .parquet(tdir)
        .select(F.timestamp_micros(F.col("ts_us")).alias("ts"), "bid")
    )
    sdf = monitor.stream_dedup(stream, key_cols=("bid",), watermark="1 hour")
    q = (
        sdf.writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    rows = spark.sql("SELECT bid FROM sdedup").collect()
    bids = sorted(r["bid"] for r in rows)
    assert bids == ["a", "b", "c", "d"]


def test_stream_sessions_match_batch_operators(spark, tmp_path):
    """Native session_window streaming sessionize: the stream output
    must equal the same session_window run as a batch agg, and the
    session STRUCTURE (count + per-user event multiset) must match the
    gaps-and-islands batch operator (sessionize) at the same gap."""
    path = str(tmp_path / "ev")
    _write_events(spark, path)
    ev = load_table(spark, SF_DIR, "events")
    ts_type = dict(ev.dtypes)["ts"]

    stream = spark.readStream.schema(
        f"event_id long, ts {ts_type}, user_id long, "
        "event_type string, value double, props string"
    ).parquet(path)
    q = _run_to_end(monitor.stream_sessions(stream), "sessions")
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    )
    q.stop()

    expect = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in monitor.stream_sessions(ev).collect()
    )
    assert got == expect
    assert len(got) > 100

    batch = monitor.sessionize(ev)  # 30-min gap default on both
    assert batch.count() == len(got)
    stream_ms = sorted((u, n) for u, _s, _e, n in got)
    batch_ms = sorted(
        (r["user_id"], r["n_events"]) for r in batch.collect()
    )
    assert stream_ms == batch_ms


def test_funnel_ordering_semantics(spark):
    """Steps must be completed strictly in order: events of a later
    step BEFORE the previous step's first completion don't count, and
    keys that never did step 1 are excluded."""
    rows = [
        # u1 completes the whole funnel in order
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2's only click precedes its first view -> click NULL
        (2, "click", 8), (2, "view", 10),
        # u3's purchase precedes its first click -> purchase NULL
        (3, "view", 10), (3, "purchase", 11), (3, "click", 12),
        # u4 never viewed -> not in the output at all
        (4, "click", 5), (4, "purchase", 6),
        # u5: second click after view counts even though first doesn't
        (5, "click", 1), (5, "view", 10), (5, "click", 15),
        (5, "purchase", 20),
    ]
    ev = spark.createDataFrame(
        [(u, t, us) for u, t, us in rows], "user_id long, event_type string, us long"
    ).select("user_id", "event_type", F.timestamp_micros("us").alias("ts"))
    got = {
        r["user_id"]: (r["t_view_us"], r["t_click_us"], r["t_purchase_us"])
        for r in monitor.funnel(ev).collect()
    }
    assert got == {
        1: (10, 20, 30),
        2: (10, None, None),
        3: (10, 12, None),
        5: (10, 15, 20),
    }


def test_stream_clean_corpus_matches_batch_gates(spark, tmp_path):
    """Streamed ingest cleaning == batch cleaning, modulo the
    documented representative rule: the stream keeps the FIRST ARRIVAL
    per normalized-content fingerprint (bounded state), the batch
    keeps the min id — so the surviving FINGERPRINT sets must be
    identical, and the quality/language gates must pass exactly the
    same docs."""
    import pandas as pd

    from pufs_spark.operators import pipeline as P
    from pufs_spark.operators import text as T
    from pufs_spark.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    # arrival order = doc_id order via one file per micro-slice
    pdf = docs.toPandas().sort_values("doc_id")
    pdf["ts"] = pd.Timestamp("2026-01-01") + pd.to_timedelta(
        range(len(pdf)), unit="s"
    )
    import os as _os

    _os.makedirs(src)
    for i, chunk in enumerate(
        [pdf.iloc[j : j + 200] for j in range(0, len(pdf), 200)]
    ):
        chunk.to_parquet(
            f"{src}/part{i:04d}.parquet",
            index=False,
            coerce_timestamps="us",  # Spark's streaming schema wants µs
        )

    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp"
    ).parquet(src)
    out = str(tmp_path / "out")
    q = (
        P.stream_clean_corpus(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out)

    batch = P.clean_corpus(docs, near_dup_threshold=None)
    batch_fps = {
        r["_fp"]
        for r in batch.withColumn(
            "_fp", F.sha2(T.normalize_text("text"), 256)
        ).select("_fp").collect()
    }
    stream_fps = {r["_fp"] for r in got.select("_fp").collect()}
    assert stream_fps == batch_fps and stream_fps
    # one survivor per fingerprint (dedup actually deduped)
    assert got.count() == len(stream_fps)
    # gate equivalence at doc level: every streamed survivor passes the
    # batch gates (its id may differ from batch's representative)
    gate_ids = {
        r["doc_id"]
        for r in P.clean_corpus(docs, near_dup_threshold=None).collect()
    }
    quality_ids = {r["doc_id"] for r in got.collect()}
    # survivors are drawn from docs that pass quality+lang (superset of
    # batch representatives, same fingerprint classes)
    all_pass = {
        r["doc_id"]
        for r in T.lang_id(
            T.quality_stats(docs).where(
                (F.col("n_tokens") >= 5)
                & (F.col("punct_ratio") <= 0.2)
                & (F.col("alpha_ratio") >= 0.5)
            )
        ).where(F.col("pred_lang") == "en").collect()
    }
    assert quality_ids <= all_pass
    assert gate_ids <= all_pass


def test_stream_clean_corpus_spread_pins_gates_past_exchange(
        spark, tmp_path):
    """``spread=N`` must actually parallelize the GATES, not just the
    fingerprint hash: Catalyst pushes deterministic filters through
    exchanges (PushDownPredicates), so a bare repartition leaves the
    quality/lang predicates — full expressions inlined — back at the
    byte-sized scan. The always-false non-deterministic disjunct
    (spark_partition_id() < -1) pins the quality filter, and every
    filter stacked above it, past the exchange. Plan-asserted on the
    batch surrogate (same optimizer rules run for micro-batch plans),
    plus output equivalence spread-vs-not on a real stream."""
    import pandas as pd

    from pufs_spark.operators import pipeline as P
    from pufs_spark.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    # -- plan pin (batch surrogate: withWatermark/dropDuplicates
    #    degrade to batch ops, the filter/exchange shape is identical)
    plan = (
        P._gate_corpus(docs, "text", 5, 0.2, 0.5, "en", spread=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    exch = plan.index("Exchange RoundRobinPartitioning")
    gate = plan.lower().index("spark_partition_id")
    assert gate < exch, (
        "quality gate filter was pushed below the spread exchange — "
        "gates would run at source parallelism:\n" + plan[:2000]
    )
    # the guard must also appear in the gate filter, not be folded away
    assert "Filter" in plan[:exch]

    # -- and without the guard, pushdown DOES defeat the repartition
    #    (pins the failure mode this exists for: if Catalyst ever stops
    #    pushing filters through exchanges, the guard can be dropped)
    from pufs_spark.operators import text as T

    naive = (
        T.quality_stats(
            docs.repartition(4), "text"
        ).where(F.col("n_tokens") >= 5).select("doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert naive.index("Filter") > naive.index("Exchange")

    # -- semantics: spread changes placement only
    pdf = docs.limit(400).toPandas()
    pdf["ts"] = pd.Timestamp("2026-01-01")
    src = str(tmp_path / "src")
    import os as _os

    _os.makedirs(src)
    pdf.to_parquet(f"{src}/part0.parquet", index=False,
                   coerce_timestamps="us")
    fps = {}
    for name, spread in (("plain", None), ("spread", 4)):
        stream = spark.readStream.schema(
            "doc_id long, text string, ts timestamp"
        ).parquet(src)
        out = str(tmp_path / f"out_{name}")
        q = (
            P.stream_clean_corpus(stream, spread=spread)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        fps[name] = {
            r["_fp"] for r in spark.read.parquet(out).select("_fp").collect()
        }
    assert fps["plain"] == fps["spread"] and fps["plain"]


def test_auto_spread_resolves_from_feed_shape(spark, tmp_path):
    """``spread="auto"`` (the r13 default) must inject the exchange
    exactly when the FILE feed is provably compact: planned splits
    (bytes/maxPartitionBytes per file) under half the cores. Many-split
    feeds and non-file sources resolve to None — the heuristic may only
    ADD parallelism to compact feeds, never an exchange elsewhere."""
    import os as _os

    import pandas as pd

    from pufs_spark.operators import pipeline as P

    pdf = pd.DataFrame(
        {"doc_id": range(100), "text": ["hello world one two three"] * 100,
         "ts": pd.Timestamp("2026-01-01")}
    )
    src = str(tmp_path / "compact")
    _os.makedirs(src)
    pdf.to_parquet(f"{src}/part0.parquet", index=False,
                   coerce_timestamps="us")
    schema = "doc_id long, text string, ts timestamp"
    cores = spark.sparkContext.defaultParallelism

    # compact single-file feed -> spread to cores
    stream = spark.readStream.schema(schema).parquet(src)
    assert P._auto_spread(stream) == cores

    # a feed that already plans >= cores/2 splits -> no exchange
    many = str(tmp_path / "many")
    _os.makedirs(many)
    for i in range(max(2, cores)):
        pdf.to_parquet(f"{many}/part{i}.parquet", index=False,
                       coerce_timestamps="us")
    wide = spark.readStream.schema(schema).parquet(many)
    assert P._auto_spread(wide) is None

    # non-file source -> None (never an exchange for Kafka/rate/...)
    rate = spark.readStream.format("rate").load()
    assert P._auto_spread(rate) is None

    # default "auto" builds the pinned-gate plan on the compact feed
    # (batch surrogate: _gate_corpus treats batch like
    # spread_for_compute — partitions < cores -> spread)
    batch = spark.read.schema(schema).parquet(src)
    plan = (
        P._gate_corpus(batch, "text", 5, 0.2, 0.5, "en", spread="auto")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange RoundRobinPartitioning" in plan
    assert plan.lower().index("spark_partition_id") < plan.index(
        "Exchange RoundRobinPartitioning"
    )
