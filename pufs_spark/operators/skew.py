"""Skew-mitigation utilities: salting patterns for hot keys.

Spark's hash aggregation already does map-side partial aggregation, so
plain groupBy tolerates skewed keys; the operators that collapse a hot
key onto one task are JOINS (all rows of a key meet one reducer) and
WINDOW functions (one partition must hold the whole key). These helpers
restore parallelism by salting, with outputs provably identical to the
unsalted op (tests/test_skew.py asserts equality):

- salted_join: replicate the small side per salt bucket, scatter the
  big side — a hot key fans out over `buckets` tasks. (AQE's skew-join
  handles sort-merge skew automatically; this is the explicit variant
  for when the small side fits per-bucket replication.)
- salted_topk: two-phase per-key top-k — per-(key, salt) top-k first,
  then global top-k over the survivors (<= buckets*k rows per key
  instead of the full key partition in one window).
- salted_distinct_count: per-(key, salt) distinct then merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SALT = "_salt"


def _scatter(df: DataFrame, buckets: int) -> DataFrame:
    """Deterministic per-row salt (no rand(): keeps retries/replays
    idempotent — a task retry with rand() would re-salt differently)."""
    return df.withColumn(
        SALT,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(buckets)).cast(
            "int"
        ),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed big side against a replicable small side: the
    small side is exploded once per salt bucket, so each hot key's rows
    spread over `buckets` reducers instead of one."""
    big_s = _scatter(big, buckets)
    small_s = small.withColumn(
        SALT,
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<int>")),
    )
    return big_s.join(small_s, [*on, SALT], how).drop(SALT)


def salted_topk(
    df: DataFrame,
    key: str,
    order_col: str,
    k: int,
    buckets: int = 16,
    tiebreak: str | None = None,
) -> DataFrame:
    """Top-k rows per key by descending order_col. Phase 1 takes top-k
    within each (key, salt) — any global top-k row is necessarily in its
    bucket's top-k — phase 2 ranks the <= buckets*k survivors."""
    order = [F.col(order_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak))
    w1 = Window.partitionBy(key, SALT).orderBy(*order)
    w2 = Window.partitionBy(key).orderBy(*order)
    survivors = (
        _scatter(df, buckets)
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_r1", SALT)
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
    )


def salted_distinct_count(
    df: DataFrame, key: str, value_col: str, buckets: int = 16
) -> DataFrame:
    """count(DISTINCT value) per key without one reducer per hot key:
    salt by the VALUE (same value → same bucket, so buckets dedup
    independently), count distinct per (key, salt), sum."""
    salted = df.withColumn(
        SALT, F.pmod(F.xxhash64(F.col(value_col)), F.lit(buckets)).cast("int")
    )
    per_bucket = salted.groupBy(key, SALT).agg(
        F.countDistinct(value_col).alias("_c")
    )
    return per_bucket.groupBy(key).agg(F.sum("_c").alias("distinct_count"))
