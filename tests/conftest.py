from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Tests use a small core count for fast startup; bench uses SPARK_GRAFT_CPUS.
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from pufs_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="pufs_spark_tests", cpus=4, shuffle_partitions=4)
    yield spark
