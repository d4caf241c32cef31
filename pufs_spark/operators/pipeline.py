"""End-to-end corpus cleaning — the composition the individual
operators exist for: quality gate → language gate → exact dedup →
near-dup dedup, as one lazy DataFrame plan (plus the near-dup grouping
jobs it needs).

Order matters at scale: the cheap narrow filters (quality, language)
run first and shrink the corpus before the shuffling stages (hash
dedup) and the candidate-join stage (MinHash LSH) pay per surviving
row."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pufs_spark.operators import dedup, sampling, text
from pufs_spark.sources import dataset


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_punct_ratio: float = 0.2,
    min_alpha_ratio: float = 0.5,
    lang: str | None = "en",
    near_dup_threshold: float | None = 0.7,
    near_dup_rows: int = 2,
) -> DataFrame:
    """Returns the surviving rows of ``docs`` (original columns).

    Stages:
    1. quality gate — token count + punct/alpha ratios (narrow, no
       shuffle, prunes before anything expensive);
    2. language gate — stopword-vote lang id;
    3. exact dedup — keep the min-id doc per content hash;
    4. near-dup dedup — MinHash+LSH groups, keep each group's min id.
    Set ``lang=None`` / ``near_dup_threshold=None`` to skip a stage.

    ``near_dup_rows`` is the LSH rows-per-band knob passed through to
    ``near_dup_pairs``: the default 2 is recall-safe at any corpus
    (miss ≈ 2e-5 at s=0.70) but pays ~20x the band collisions of
    rows=4; a caller who KNOWS the corpus has no pairs near the
    threshold (see near_dup_pairs' contract) can pass 4 — measured
    4-5x faster on the whole clean_corpus composition at sf0.1, since
    the near-dup stage dominates its wall (BASELINE.md)."""
    out = docs
    q = text.quality_stats(out, text_col)
    out = (
        q.where(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("punct_ratio") <= max_punct_ratio)
            & (F.col("alpha_ratio") >= min_alpha_ratio)
        )
        .select(*docs.columns)
    )
    if lang is not None:
        out = (
            text.lang_id(out, text_col)
            .where(F.col("pred_lang") == lang)
            .select(*docs.columns)
        )
    out = (
        dedup.duplicate_rank(out, text_col, id_col)
        .where(F.col("dup_rank") == 1)
        .select(*docs.columns)
    )
    if near_dup_threshold is not None:
        pairs = dedup.near_dup_pairs(
            out, threshold=near_dup_threshold, text_col=text_col,
            id_col=id_col, rows=near_dup_rows,
        ).localCheckpoint()
        out = dedup.dedup_keep_first(out, pairs, id_col)
    return out


def prepare_training_corpus(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_weights: dict[str, float] | None = None,
    split_seed: int = 0,
    eval_df: DataFrame | None = None,
    max_contamination: float = 0.0,
    pack_budget: int | None = None,
    **clean_kwargs,
) -> DataFrame:
    """The full corpus-preparation sink: clean (quality/lang/dedup) →
    optional eval-decontamination gate → deterministic train/val/test
    assignment → split-partitioned parquet layout. Returns the written
    frame (with the ``split`` column) for inspection; the on-disk
    layout is ``path/split=train/...`` etc., so downstream trainers
    read exactly one split subtree with partition pruning and the
    val/test sets can never leak into a training glob.

    Contamination gate: with ``eval_df`` given, docs whose distinct
    n-gram overlap with the eval set exceeds ``max_contamination`` are
    dropped BEFORE split assignment (default 0.0 = any overlap drops).
    Split assignment is md5-keyed (operators/sampling), so re-running
    the pipeline — or re-sharding the input — never moves a doc
    between splits.

    ``pack_budget`` additionally emits the sequence-packing layout
    (``pack_sequences``) per split to ``path/_packing/split=<s>/`` —
    the loader-side metadata to slice the written split into fixed
    ``pack_budget``-token training sequences. Packing runs PER SPLIT
    (after assignment), so a val/test doc can never share a pack with
    a training doc."""
    out = clean_corpus(docs, text_col, id_col, **clean_kwargs)
    if eval_df is not None:
        scores = text.eval_contamination(out, eval_df, text_col, id_col)
        keep = scores.where(
            F.col("contamination") <= max_contamination
        ).select(id_col)
        out = out.join(keep, id_col, "left_semi")
    out = sampling.assign_splits(
        out, split_weights, id_col, seed=split_seed
    )
    dataset.write_partitioned(out, path, ["split"], [id_col])
    if pack_budget is not None:
        layout = pack_sequences(
            out.select(id_col, text_col, "split"),
            budget=pack_budget,
            text_col=text_col,
            id_col=id_col,
            split_col="split",
        )
        dataset.write_partitioned(
            layout, f"{path.rstrip('/')}/_packing", ["split"], [id_col]
        )
    return out


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_hex: int = 1,
    seed: int = 0,
    split_col: str | None = None,
) -> DataFrame:
    """GPT-style sequence-packing layout: documents are concatenated in
    a deterministic order and chunked into fixed ``budget``-token
    training sequences (documents span chunk boundaries — the standard
    concat-then-chunk packing LM training uses). Returns per document
    the metadata a training loader needs to slice it into its packs:
    (id, shard, n_tokens, tok_offset, start_pack, end_pack).

    Determinism and scale use the same md5 rule as operators/sampling:
    a single global concatenation order would be ONE sorted task, so
    docs shard by the first ``shard_hex`` hex digits of
    md5(seed || ':' || id) — 16^shard_hex shards, content-keyed,
    partition/rerun/engine invariant — and pack independently per shard
    (one window sort per shard, all shards parallel). Zero-token docs
    occupy no space (end_pack == start_pack, width 0).

    ``split_col`` packs within (split, shard) instead — train/val/test
    never share a pack — and carries the split column through.
    """
    from pufs_spark.operators.text import tokens_col

    shard = F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
        1,
        shard_hex,
    )
    keys = ([split_col] if split_col else []) + ["shard"]
    t = docs.select(
        F.col(id_col),
        *([F.col(split_col)] if split_col else []),
        shard.alias("shard"),
        F.size(tokens_col(text_col)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.withColumn("tok_offset", off).select(
        id_col,
        *keys,
        "n_tokens",
        "tok_offset",
        F.floor(F.col("tok_offset") / budget).alias("start_pack"),
        F.when(
            F.col("n_tokens") > 0,
            F.floor((F.col("tok_offset") + F.col("n_tokens") - 1) / budget),
        )
        .otherwise(F.floor(F.col("tok_offset") / budget))
        .alias("end_pack"),
    )


def stream_clean_corpus(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    min_tokens: int = 5,
    max_punct_ratio: float = 0.2,
    min_alpha_ratio: float = 0.5,
    lang: str | None = "en",
    watermark: str = "10 minutes",
    spread: int | str | None = "auto",
) -> DataFrame:
    """``clean_corpus`` for a STREAM — the ingest-time gate a
    continuously-arriving corpus needs: the same quality and language
    filters (stateless expressions, identical thresholds and
    semantics: a doc passes the stream gate iff it passes the batch
    gate), then exact dedup on the normalized-content fingerprint with
    BOUNDED state (``monitor.stream_dedup``:
    dropDuplicatesWithinWatermark — state sized by arrival-rate ×
    watermark, keeping the FIRST arrival per content).

    Near-dup dedup is deliberately absent: LSH banding needs
    corpus-wide joins, which is batch work — run
    ``cross_near_dup_pairs(corpus_index=...)`` on the micro-batched
    output (foreachBatch) against the persisted index instead.
    Returns the surviving stream rows (original columns + ``_fp``).

    ``spread`` repartitions each micro-batch BEFORE the gates: Spark
    sizes file-source splits by BYTES, so a compact columnar feed
    (50k docs ≈ 5 MB) plans 1-2 input partitions and the gate
    expressions — compute-dense even JVM-side — run on 1-2 of N cores,
    the same trap ``spread_for_compute`` closes for batch (that helper
    is a no-op on streaming plans: partition counts aren't inspectable
    pre-execution). A bare ``repartition`` is NOT enough: Catalyst
    pushes deterministic filters through exchanges
    (PushDownPredicates), so the gate predicates — with the full
    quality expressions inlined — land back at the scan and run at
    source parallelism anyway (plan-asserted in
    tests/test_streaming.py). The quality filter therefore carries an
    always-false non-deterministic disjunct
    (``spark_partition_id() < -1``: partition ids are non-negative, so
    semantics are unchanged) which pins it, and every filter above it,
    past the exchange. Measured (tools/bench_stream_spread.py, r12):
    see BASELINE.md.

    ``spread="auto"`` (the default, r13): probe the stream's source at
    plan time — for a FILE source, list the feed directory and estimate
    its planned splits from bytes/``maxPartitionBytes``; inject the
    exchange only when splits come to under half the cores. Many-split
    feeds and non-file sources (Kafka with many partitions, rate)
    resolve to no exchange, so the heuristic cannot regress them; pass
    an int to force, ``None`` to disable. The probe sees the feed AS OF
    stream start — a feed that starts compact and grows stays spread
    (harmless: the exchange is per-batch and cheap relative to gates);
    one that starts huge and turns compact keeps source parallelism
    (the r11 behavior). The better fix for FILE feeds, when you control
    the session, is lowering ``spark.sql.files.maxPartitionBytes`` so
    the source itself plans enough splits (no extra shuffle at all)."""
    from pufs_spark.streaming.monitor import stream_dedup

    out = _gate_corpus(
        stream, text_col, min_tokens, max_punct_ratio, min_alpha_ratio,
        lang, spread,
    )
    return stream_dedup(
        out, key_cols=("_fp",), ts_col=ts_col, watermark=watermark
    )


def _auto_spread(stream: DataFrame) -> int | None:
    """Resolve ``spread="auto"``: the core count when the source will
    plan far fewer splits than cores, else None (no exchange).

    Batch frames use the actual partition count (same rule as
    ``spread_for_compute``). Streaming plans can't be asked for
    partitions pre-execution, but a FILE source's split count is
    computable at plan time from the feed directory it was bound to:
    sum over data files of ceil(bytes / maxPartitionBytes). The source
    path comes from the analyzed plan's StreamingRelation leaf
    (rendered ``FileSource[<path>]``); any non-file source — Kafka,
    rate, socket, a custom DataSource — doesn't match and resolves to
    None, so the heuristic can only ADD parallelism to provably-compact
    file feeds, never an exchange to a feed that already has splits."""
    import logging
    import math
    import re

    sc = stream.sparkSession.sparkContext
    cores = sc.defaultParallelism
    if not stream.isStreaming:
        n = stream.rdd.getNumPartitions()
        return cores if n < cores else None
    try:
        plan = stream._jdf.queryExecution().analyzed().toString()
        m = re.search(r"FileSource\[([^\]]+)\]", plan)
        if not m:
            return None
        path = m.group(1)
        files = _feed_data_files(path)
        if not files:
            return None
        mpb = dedup._parse_mem(
            stream.sparkSession.conf.get(
                "spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024)
            ).rstrip("b")  # bytesConf renders as e.g. "134217728b"
        )
        splits = sum(max(1, math.ceil(sz / mpb)) for sz in files)
        if splits < cores // 2:
            logging.getLogger("pufs_spark").info(
                "stream_clean_corpus auto-spread: %d planned splits for "
                "%d files under %s < %d cores/2 -> repartition(%d)",
                splits, len(files), path, cores, cores,
            )
            return cores
        return None
    except Exception:  # noqa: BLE001 — a probe failure must never kill
        return None     # the stream; no spread is the safe default


def _feed_data_files(path: str) -> list[int] | None:
    """Sizes of the data files a file stream source would list under
    ``path`` (glob-aware, metadata/hidden files excluded).

    Accepts bare local paths and ``file:`` URIs (ADVICE r13: a feed
    bound via ``file:/...`` must not silently skip the spread probe).
    Non-local schemes (hdfs://, s3a://, ...) return None — the probe
    can't stat them driver-side; the caller logs and takes no-spread."""
    import glob as _glob
    import logging
    import os
    import re

    # Scheme handling WITHOUT urlparse (ADVICE r14): urlparse splits
    # on '?' before the glob check, so file:/data/feed?.json was
    # truncated at the '?' and the probe silently statted the wrong
    # path — but '?' is a glob metacharacter in Hadoop file sources.
    # Strip only a literal 'file:' prefix; everything after it is a
    # path (Spark's file source does no query-string parsing either).
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*):", path)
    if m and len(m.group(1)) > 1:  # len>1: skip C:\ paths
        scheme = m.group(1)
        if scheme != "file":
            logging.getLogger("pufs_spark").debug(
                "auto-spread probe: non-local scheme %s:// for %s — "
                "skipping (no spread)", scheme, path,
            )
            return None
        rest = path[len("file:"):]
        if rest.startswith("//"):
            authority, _, tail = rest[2:].partition("/")
            if authority not in ("", "localhost"):
                # file://host/path: the probe can't stat another
                # host's filesystem — warn (it used to silently probe
                # the local path) and take no-spread.
                logging.getLogger("pufs_spark").warning(
                    "auto-spread probe: file: URI with non-local "
                    "authority %r in %s — skipping (no spread)",
                    authority, path,
                )
                return None
            rest = "/" + tail
        path = rest or "/"

    if any(c in path for c in "*?["):
        roots = _glob.glob(path)
    else:
        roots = [path]
    sizes: list[int] = []
    for root in roots:
        if os.path.isfile(root):
            sizes.append(os.path.getsize(root))
            continue
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
            for f in filenames:
                if f.startswith(("_", ".")) or f.endswith(".crc"):
                    continue
                try:
                    sizes.append(os.path.getsize(os.path.join(dirpath, f)))
                except OSError:
                    continue
    return sizes


def _gate_corpus(
    stream: DataFrame,
    text_col: str,
    min_tokens: int,
    max_punct_ratio: float,
    min_alpha_ratio: float,
    lang: str | None,
    spread: int | str | None,
) -> DataFrame:
    """The stateless gate stage of ``stream_clean_corpus`` (quality +
    lang filters + ``_fp``), factored out so the spread plan shape is
    testable on a batch frame (dropDuplicatesWithinWatermark refuses
    batch input; the Catalyst rules that matter here are shared)."""
    if spread == "auto":
        spread = _auto_spread(stream)
    gate_guard = F.lit(False)
    if spread:
        stream = stream.repartition(spread)
        gate_guard = F.spark_partition_id() < F.lit(-1)
    cols = stream.columns
    q = text.quality_stats(stream, text_col)
    out = q.where(
        (
            (F.col("n_tokens") >= min_tokens)
            & (F.col("punct_ratio") <= max_punct_ratio)
            & (F.col("alpha_ratio") >= min_alpha_ratio)
        )
        | gate_guard
    ).select(*cols)
    if lang is not None:
        out = (
            text.lang_id(out, text_col)
            .where(F.col("pred_lang") == lang)
            .select(*cols)
        )
    return out.withColumn(
        "_fp", F.sha2(text.normalize_text(text_col), 256)
    )
