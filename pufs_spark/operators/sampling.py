"""Deterministic sampling and split assignment for training-data mixes.

Sampling decisions in a corpus pipeline must be REPRODUCIBLE (the same
corpus yields the same sample regardless of partitioning, task retries,
or cluster size) and STABLE PER DOCUMENT (a doc keeps its split across
runs and engines, so eval sets never leak into training after a
re-shard). Seeded ``rand()`` gives neither — it is per-row-ORDER
deterministic, not per-KEY deterministic, and reshuffles change it.

Every decision here is keyed on ``md5(seed || ':' || key)`` instead:
content-keyed, partition-independent, and portable — md5 produces the
same lowercase hex in Spark, DuckDB, Trino, and Python's hashlib, so
the exact sample is reproducible cross-engine (the correctness oracle
replays it in SQL). The first 12 hex digits (48 bits) are compared
against a threshold as STRINGS: lowercase-hex ordering is numeric
ordering, and 48 bits keeps the acceptance error below 4e-15 of the
requested rate.

This generalizes the reference's deterministic content addressing
(hash-keyed identity, core/freezer.go:672-711) to sampling decisions;
the reference's own reservoir sampler (core/samples.go:9-71) is the
non-deterministic cousin covered by streaming/monitor.reservoir_sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_BITS = 48  # 12 hex digits


def hash_bucket(key_col: str, seed: int = 0) -> Column:
    """Uniform 12-hex-digit bucket for a key: the first 48 bits of
    md5(seed || ':' || key) as lowercase hex. SQL twin:
    ``substr(md5(seed || ':' || coalesce(CAST(key AS VARCHAR), chr(0))), 1, 12)``.

    NULL-key policy (explicit, because sampling keys should never be
    null but silently diverging when they are is a skew/leak hazard):
    null keys hash through a NUL-byte sentinel, so they all land in ONE
    deterministic bucket and every operator here treats them the same
    way — sampled all-or-nothing at the stated rate, assigned one
    consistent split. Without this, md5(null) is null and null-key rows
    vanished from hash_sample while assign_splits routed them all to
    the LAST split. Callers for whom null keys are meaningful should
    coalesce or filter the key column themselves first."""
    key = F.coalesce(F.col(key_col).cast("string"), F.lit("\x00"))
    return F.substring(F.md5(F.concat(F.lit(f"{seed}:"), key)), 1, 12)


def rate_threshold(rate: float) -> str:
    """The acceptance threshold for ``rate`` in [0, 1]: a key is
    accepted iff its hash_bucket sorts strictly below this. Comparison
    is lexicographic on lowercase hex (bytewise in both Spark and
    DuckDB), so rate 1.0 returns ``"g"`` — a string sorting after
    every hex digit — rather than the 13-digit ``0x1000000000000``,
    which would sort BEFORE buckets starting 'f' and silently drop
    them."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate {rate} outside [0, 1]")
    v = int(rate * (1 << _HEX_BITS))
    if v >= (1 << _HEX_BITS):
        return "g"
    return format(v, "012x")


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, keyed on
    ``key_col``. Pure filter — no shuffle, pushed into the scan."""
    return df.where(hash_bucket(key_col, seed) < F.lit(rate_threshold(rate)))


def assign_splits(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash range — the standard
    train/val/test partition, stable per key across runs, engines, and
    re-shards. ``weights`` must sum to 1 (within float tolerance); the
    last split absorbs the remainder so the ranges cover [0, 1)."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights sum to {total}, expected 1")
    bucket = hash_bucket(key_col, seed)
    names = list(weights)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        cond = bucket < F.lit(rate_threshold(acc))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the "training mix" op:
    down-/up-weight sources or languages by sampling each stratum at
    its own rate (e.g. ``{"src0": 1.0, "src1": 0.25}``). Strata not
    listed sample at ``default_rate``. The rate table is a literal
    CASE expression, so the plan stays a scan-level filter: no join,
    no shuffle, prunable."""
    bucket = hash_bucket(key_col, seed)
    expr = None
    for stratum, rate in rates.items():
        cond = F.col(strata_col) == F.lit(stratum)
        thr = F.lit(rate_threshold(rate))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    fallback = F.lit(rate_threshold(default_rate))
    threshold = fallback if expr is None else expr.otherwise(fallback)
    return df.where(bucket < threshold)
