"""SparkSession factory with scale-aware defaults.

Local-mode knobs are test-only; the config values that matter at cluster
scale (AQE, shuffle partitions, Arrow) are set identically for both.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pufs_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults follow the driver contract: ``local[$SPARK_GRAFT_CPUS]``
    (32 if unset). ``spark.sql.shuffle.partitions`` is sized to the core
    count — on a real cluster this would be ~2-3x total executor cores and
    AQE coalesces down at runtime.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 4)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("PUFS_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The driver-generated parquet uses TIMESTAMP(NANOS) which Spark
        # refuses by default; read as long and convert in tables.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Off by default in Spark 4.1; the `pufs` data source implements
        # pushFilters (point lookups / path prefixes prune partition
        # planning driver-side and skip CAS opens entirely).
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make ``pufs_spark`` importable on executor Python workers.

    Several operators close over module-level helpers (e.g. the
    ``pandas_udf`` in operators/dedup.py, ``_set_bits`` in
    operators/indexes.py), which cloudpickle serializes BY REFERENCE —
    the worker must import the module. That holds when the driver runs
    from the repo root (workers inherit cwd) but not when the package
    is imported from an arbitrary path (a driver-side ``sys.path``
    entry is not propagated). Shipping a zip via ``addPyFile`` is the
    in-code equivalent of ``spark-submit --py-files`` and covers every
    deployment shape, including a real multi-node cluster. Once per
    SparkContext; ~10 ms for this package's size."""
    sc = spark.sparkContext
    if getattr(sc, "_pufs_pkg_shipped", False):
        return
    import atexit
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # Deterministic per-process path, NOT mkstemp: executors fetch the
    # zip from this original path lazily at first task (deleting it
    # early breaks updateDependencies), and a host cycling many
    # SparkContexts in one process would otherwise accrete one random
    # zip per context. One path per (uid, pid) caps the footprint at a
    # single file, rewritten with identical content on re-ship, and the
    # atexit hook removes it when the driver process exits.
    zip_path = os.path.join(
        tempfile.gettempdir(),
        f"pufs_spark_pkg_{os.getuid()}_{os.getpid()}.zip",
    )
    atexit.register(_remove_quiet, zip_path)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for name in files:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                zf.write(full, rel)
    sc.addPyFile(zip_path)
    # Spark 4.1's STREAMING Python planner (python_streaming_source_
    # runner, which unpickles the pufs_commits DataSource) resolves its
    # includes under <userFiles>/streaming_job/ — streaming queries are
    # tagged with that job-artifact state — while addPyFile lands the
    # zip at the userFiles ROOT. A stream planned from a driver that
    # imported pufs_spark via sys.path (not cwd) therefore failed with
    # ModuleNotFoundError. The planner always runs on the driver, so a
    # driver-local mirror of the zip into that subdir closes the gap;
    # cwd-launched drivers never notice (import falls back to cwd).
    try:
        import shutil

        from pyspark.core.files import SparkFiles

        sj_dir = os.path.join(SparkFiles.getRootDirectory(), "streaming_job")
        os.makedirs(sj_dir, exist_ok=True)
        shutil.copy2(zip_path, os.path.join(sj_dir, os.path.basename(zip_path)))
    except Exception:  # noqa: BLE001 — artifact-dir convention may move;
        pass  # cwd-based imports still cover the repo-root launch shape
    sc._pufs_pkg_shipped = True


def _remove_quiet(path: str) -> None:
    try:
        os.remove(path)
    except OSError:
        pass
