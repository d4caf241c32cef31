import os

from tests.conftest import SF_DIR

from pufs_spark.tables import TPCH_TABLES, load_tables


def test_load_all_tables(spark):
    dfs = load_tables(spark, SF_DIR)
    assert set(dfs) == set(TPCH_TABLES)
    assert dfs["region"].count() == 5
    assert dfs["lineitem"].count() > 1000


def test_ship_package_covers_streaming_planner(spark):
    """_ship_package must land the package zip BOTH at the userFiles
    root (task workers' includes) AND under streaming_job/ — Spark
    4.1's streaming Python planner resolves its includes under that
    job-artifact dir, so a pufs_commits stream planned from a driver
    that imported pufs_spark via sys.path (not cwd) dies with
    ModuleNotFoundError without the mirror copy. Pytest runs from the
    repo root (cwd masks the failure), so pin the mechanism: the zip
    exists at both paths."""
    from pyspark.core.files import SparkFiles

    root = SparkFiles.getRootDirectory()
    names = [n for n in os.listdir(root) if n.startswith("pufs_spark_pkg_")]
    assert names, f"package zip missing from userFiles root {root}"
    sj = os.path.join(root, "streaming_job")
    assert os.path.isdir(sj) and set(names) & set(os.listdir(sj)), (
        "package zip not mirrored into the streaming planner's "
        f"job-artifact dir {sj}"
    )
