"""End-to-end corpus cleaning — the composition the individual
operators exist for: quality gate → language gate → exact dedup →
near-dup dedup, as one lazy DataFrame plan (plus the near-dup grouping
jobs it needs).

Order matters at scale: the cheap narrow filters (quality, language)
run first and shrink the corpus before the shuffling stages (hash
dedup) and the candidate-join stage (MinHash LSH) pay per surviving
row."""

from __future__ import annotations

from pyspark.sql import DataFrame
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
) -> DataFrame:
    """Returns the surviving rows of ``docs`` (original columns).

    Stages:
    1. quality gate — token count + punct/alpha ratios (narrow, no
       shuffle, prunes before anything expensive);
    2. language gate — stopword-vote lang id;
    3. exact dedup — keep the min-id doc per content hash;
    4. near-dup dedup — MinHash+LSH groups, keep each group's min id.
    Set ``lang=None`` / ``near_dup_threshold=None`` to skip a stage.
    """
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
            out, threshold=near_dup_threshold, text_col=text_col, id_col=id_col
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
    between splits."""
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
    return out
