"""Partitioned dataset sink — the relational-side S11: lay data out so
Catalyst prunes at read time.

At 100TB the first-order lever is never touching irrelevant bytes:
partition directories prune whole subtrees before any task launches,
bucketing co-locates recurring join keys (tests/test_bucketing.py), and
within files parquet row-group stats prune via pushed filters. This
module is the thin, opinionated writer for that layout."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_within_partitions: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-style partition layout. Sorting within partitions tightens
    parquet min/max stats so row-group pruning bites on the sort key."""
    out = df
    if sort_within_partitions:
        out = out.sortWithinPartitions(*sort_within_partitions)
    out.write.partitionBy(*partition_by).mode(mode).parquet(path)


def read_dataset(spark: SparkSession, path: str) -> DataFrame:
    """Plain spark.read — partition columns come back typed from the
    directory layout; filters on them prune before listing tasks."""
    return spark.read.parquet(path)
