"""SQL surface: register the catalog as temp views so the entire engine
is queryable with plain ``spark.sql`` (SURVEY §7.1 — the reference has
no query language; Spark SQL comes free once the tables exist).

Views registered:
    pufs_nodes    — the inode catalog (from a DataStore or any nodes DF)
    pufs_regions  — the raw region log
    pufs_mask     — merged disjoint coverage mask (view over the log)
    pufs_blocks   — per-block coverage stats
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pufs_spark.operators import intervals


def register_views(
    spark: SparkSession,
    nodes: DataFrame,
    regions: DataFrame | None = None,
    prefix: str = "pufs",
) -> list[str]:
    """Create/replace the temp views; returns their names."""
    out = []
    nodes.createOrReplaceTempView(f"{prefix}_nodes")
    out.append(f"{prefix}_nodes")
    if regions is not None:
        regions.createOrReplaceTempView(f"{prefix}_regions")
        mask = intervals.merge_intervals(regions)
        mask.createOrReplaceTempView(f"{prefix}_mask")
        intervals.coverage_stats(mask).createOrReplaceTempView(
            f"{prefix}_blocks"
        )
        out += [f"{prefix}_regions", f"{prefix}_mask", f"{prefix}_blocks"]
    return out
