"""Deterministic filesystem-tree derivation from the TPC-H-ish tables.

The correctness gate needs catalog-shaped queries whose DuckDB oracle
can be expressed over the driver's pre-registered relational views. So
both sides derive the SAME virtual inode tree from the same tables:

    /                               inode 1
    /<r_name>/                      inode 2 + r_regionkey        (dirs)
    /<r_name>/<n_name>/             inode 10 + n_nationkey       (dirs)
    /<r_name>/<n_name>/<c_name>/    inode 100 + c_custkey        (dirs)
    .../order_<o_orderkey>.dat      inode 100000 + o_orderkey    (files)

File size  = floor(o_totalprice * 100)  (integer cents)
File bid   = 'blk_' || o_orderkey
Region log = one interval per lineitem row of that order:
    start = (l_linenumber - 1) * 4096
    end   = start + floor(l_quantity) * 128 + 4096
(lengths overlap adjacent line slots on purpose — the mask view must
merge them, exercising R2 at scale.)

`SQL_*` constants are the DuckDB-side CTE bodies; the DataFrame builders
below are the Spark side. Keep them in lockstep — every oracle in
__spark_entry__.py depends on the equivalence.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pufs_spark.tables import load_table

ROOT = 1

SQL_FS_NODES = """
fs_nodes AS (
    SELECT 1::BIGINT AS inode, 1::BIGINT AS parent, '' AS name,
           TRUE AS is_dir, 0::BIGINT AS size, CAST(NULL AS VARCHAR) AS bid
    UNION ALL
    SELECT 2 + r_regionkey, 1, r_name, TRUE, 0, NULL
    FROM region
    UNION ALL
    SELECT 10 + n_nationkey, 2 + n_regionkey, n_name, TRUE, 0, NULL
    FROM nation
    UNION ALL
    SELECT 100 + c_custkey, 10 + c_nationkey, c_name, TRUE, 0, NULL
    FROM customer
    UNION ALL
    SELECT 100000 + o_orderkey, 100 + o_custkey,
           'order_' || o_orderkey || '.dat', FALSE,
           CAST(floor(o_totalprice * 100) AS BIGINT),
           'blk_' || o_orderkey
    FROM orders
)
"""

SQL_FS_REGIONS = """
fs_regions AS (
    SELECT 'blk_' || l_orderkey AS bid,
           CAST((l_linenumber - 1) * 4096 AS BIGINT) AS start,
           CAST((l_linenumber - 1) * 4096
                + CAST(floor(l_quantity) AS BIGINT) * 128 + 4096 AS BIGINT) AS "end"
    FROM lineitem
)
"""

def sql_islands(src: str) -> str:
    """DuckDB gaps-and-islands merge over a (bid, start, end) CTE named
    ``src`` — the oracle twin of operators.intervals.merge_intervals.

    The inner DISTINCT is load-bearing: with exact-duplicate log rows
    the two stacked windows may order tied rows differently between
    passes, so the row carrying prev_max=NULL can land mid-partition and
    falsely start a new island. Duplicates are a no-op for union
    semantics anyway."""
    return f"""
    SELECT bid, min(start) AS start, max("end") AS "end"
    FROM (
        SELECT bid, start, "end",
               sum(CASE WHEN start > coalesce(prev_max, -9223372036854775808)
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY bid ORDER BY start, "end"
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
        FROM (
            SELECT bid, start, "end",
                   max("end") OVER (PARTITION BY bid ORDER BY start, "end"
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS prev_max
            FROM (SELECT DISTINCT bid, start, "end" FROM {src})
        )
    )
    GROUP BY bid, island
"""


# Disjoint merged mask (R2) as a DuckDB CTE (gaps-and-islands).
SQL_FS_MASK = "\nfs_mask AS (" + sql_islands("fs_regions") + ")\n"


def fs_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    root = spark.range(1).select(
        F.lit(1).cast("long").alias("inode"),
        F.lit(1).cast("long").alias("parent"),
        F.lit("").alias("name"),
        F.lit(True).alias("is_dir"),
        F.lit(0).cast("long").alias("size"),
        F.lit(None).cast("string").alias("bid"),
    )
    regions = region.select(
        (F.lit(2) + F.col("r_regionkey")).cast("long").alias("inode"),
        F.lit(1).cast("long").alias("parent"),
        F.col("r_name").alias("name"),
        F.lit(True).alias("is_dir"),
        F.lit(0).cast("long").alias("size"),
        F.lit(None).cast("string").alias("bid"),
    )
    nations = nation.select(
        (F.lit(10) + F.col("n_nationkey")).cast("long").alias("inode"),
        (F.lit(2) + F.col("n_regionkey")).cast("long").alias("parent"),
        F.col("n_name").alias("name"),
        F.lit(True).alias("is_dir"),
        F.lit(0).cast("long").alias("size"),
        F.lit(None).cast("string").alias("bid"),
    )
    customers = customer.select(
        (F.lit(100) + F.col("c_custkey")).cast("long").alias("inode"),
        (F.lit(10) + F.col("c_nationkey")).cast("long").alias("parent"),
        F.col("c_name").alias("name"),
        F.lit(True).alias("is_dir"),
        F.lit(0).cast("long").alias("size"),
        F.lit(None).cast("string").alias("bid"),
    )
    files = orders.select(
        (F.lit(100000) + F.col("o_orderkey")).cast("long").alias("inode"),
        (F.lit(100) + F.col("o_custkey")).cast("long").alias("parent"),
        F.concat(F.lit("order_"), F.col("o_orderkey"), F.lit(".dat")).alias(
            "name"
        ),
        F.lit(False).alias("is_dir"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("size"),
        F.concat(F.lit("blk_"), F.col("o_orderkey")).alias("bid"),
    )
    return root.unionByName(regions).unionByName(nations).unionByName(
        customers
    ).unionByName(files)


def fs_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    start = ((F.col("l_linenumber") - 1) * 4096).cast("long")
    return lineitem.select(
        F.concat(F.lit("blk_"), F.col("l_orderkey")).alias("bid"),
        start.alias("start"),
        (start + F.floor(F.col("l_quantity")).cast("long") * 128 + 4096).alias(
            "end"
        ),
    )


def parquet_path(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")
