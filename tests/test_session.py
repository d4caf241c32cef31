from tests.conftest import SF_DIR

from pufs_spark.tables import TPCH_TABLES, load_tables


def test_load_all_tables(spark):
    dfs = load_tables(spark, SF_DIR)
    assert set(dfs) == set(TPCH_TABLES)
    assert dfs["region"].count() == 5
    assert dfs["lineitem"].count() > 1000
