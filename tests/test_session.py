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


def test_ship_package_does_not_accrete_temp_zips(spark):
    """One deterministic per-(uid,pid) zip, not one mkstemp file per
    SparkContext: a long-lived host cycling many sessions must not
    accrete zips in the system temp dir (the atexit hook removes the
    single file at process exit; executors fetch from the original
    path lazily, so it cannot be deleted while the context lives)."""
    import glob
    import tempfile

    from pufs_spark import session as sess

    expected = os.path.join(
        tempfile.gettempdir(),
        f"pufs_spark_pkg_{os.getuid()}_{os.getpid()}.zip",
    )
    # force a re-ship: same path is rewritten, no second file appears
    spark.sparkContext._pufs_pkg_shipped = False
    sess._ship_package(spark)
    mine = glob.glob(
        os.path.join(
            tempfile.gettempdir(), f"pufs_spark_pkg_{os.getuid()}_*.zip"
        )
    )
    assert mine == [expected], f"zips accreted: {mine}"
