"""Salted operators must produce exactly the unsalted results — the
whole point is changing the physical distribution, never the answer.
Skewed fixture: one key owns ~90% of rows."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from pufs_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"),
        (F.col("id") % 997).alias("v"),
        (F.col("id") * 7 % 10000).alias("score"),
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("cold"), F.col("id") % 50).alias("k"),
        (F.col("id") % 31).alias("v"),
        (F.col("id") * 13 % 10000).alias("score"),
    )
    return hot.unionByName(cold).localCheckpoint()


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold1", "C1"), ("cold7", "C7"), ("never", "N")],
        "k string, label string",
    )
    plain = skewed.join(dim, ["k"])
    salted = skew.salted_join(skewed, dim, ["k"], buckets=8)
    cols = ["k", "v", "score", "label"]
    assert _rows(salted, cols) == _rows(plain, cols)
    assert plain.count() > 9000  # the hot key actually joined


def test_salted_join_left(spark, skewed):
    dim = spark.createDataFrame([("hot", "H")], "k string, label string")
    plain = skewed.join(dim, ["k"], "left")
    salted = skew.salted_join(skewed, dim, ["k"], buckets=4, how="left")
    cols = ["k", "v", "score", "label"]
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_topk_matches_window(spark, skewed):
    # make (score, v) a total order per key so top-k is deterministic
    df = skewed.dropDuplicates(["k", "score"])
    w = Window.partitionBy("k").orderBy(F.col("score").desc(), F.col("v"))
    plain = (
        df.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= 5)
    )
    salted = skew.salted_topk(df, "k", "score", k=5, buckets=8, tiebreak="v")
    cols = ["k", "score", "rank"]
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_distinct_count(spark, skewed):
    plain = skewed.groupBy("k").agg(
        F.countDistinct("v").alias("distinct_count")
    )
    salted = skew.salted_distinct_count(skewed, "k", "v", buckets=8)
    cols = ["k", "distinct_count"]
    assert _rows(salted, cols) == _rows(plain, cols)
