"""DataFrame query layer (L1-L3, P5, F2/A3 distributed variants)."""

import pytest

from pufs_spark.catalog import queries
from pufs_spark.catalog.datastore import ROOT_INODE, DataStore
from pufs_spark.sources.remote import MemRemote


@pytest.fixture
def tree(tmp_path):
    ds = DataStore(str(tmp_path / "store"), remote=MemRemote())
    a = ds.mkdir(ROOT_INODE, "a")
    b = ds.mkdir(ROOT_INODE, "b")
    ds.add_immutable_bytes(a, "f1", b"one")
    ds.add_immutable_bytes(a, "f2", b"two!")
    ds.add_immutable_bytes(b, "g", b"ggg")
    return ds, a, b


def test_dir_listing(spark, tree):
    ds, a, b = tree
    nodes = queries.nodes_df(spark, ds)
    rows = queries.dir_listing(nodes, ROOT_INODE).collect()
    assert [(r["name"], r["inode"]) for r in rows] == [("a", a), ("b", b)]
    dots = queries.dir_listing(nodes, a, include_dots=True).collect()
    assert [r["name"] for r in dots][:2] == [".", ".."]
    assert dots[1]["inode"] == ROOT_INODE


def test_walk_dir_contents(spark, tree):
    ds, a, _ = tree
    nodes = queries.nodes_df(spark, ds)
    rows = queries.walk_dir_contents(nodes, a).collect()
    assert [r["name"] for r in rows] == ["f1", "f2"]
    assert rows[0]["size"] == 3 and not rows[0]["is_dir"]
    assert rows[0]["bid"] is not None


def test_extended_dir_contents(spark, tree):
    ds, a, _ = tree
    nodes = queries.nodes_df(spark, ds)
    f1_bid = ds.get_node(ds.resolve_path("/a/f1")).bid
    regions = spark.createDataFrame(
        [(f1_bid, 0, 2), (f1_bid, 2, 3)],  # adjacent: merges to one
        "bid string, start long, end long",
    )
    rows = queries.extended_dir_contents(nodes, regions, a).collect()
    by_name = {r["name"]: r for r in rows}
    assert by_name["f1"]["populated_region_count"] == 1
    assert by_name["f1"]["populated_size"] == 3
    assert by_name["f2"]["populated_region_count"] == 0


def test_resolve_path_df(spark, tree):
    ds, a, _ = tree
    nodes = queries.nodes_df(spark, ds)
    row = queries.resolve_path(nodes, "/a/f2").collect()
    assert len(row) == 1 and row[0]["inode"] == ds.resolve_path("/a/f2")
    assert queries.resolve_path(nodes, "/a/../b/g").collect()[0][
        "inode"
    ] == ds.resolve_path("/b/g")
    assert queries.resolve_path(nodes, "/nope").count() == 0


def test_descendants_and_unpushed(spark, tree):
    ds, a, _ = tree
    ds.freeze()
    nodes = queries.nodes_df(spark, ds)
    sub = queries.descendants(nodes, a)
    assert sorted(r["name"] for r in sub.collect()) == ["a", "f1", "f2"]
    pushed = spark.createDataFrame(
        [(ds.get_node(ds.resolve_path("/a/f1")).bid,)], "bid string"
    )
    unpushed = queries.unpushed_bids(nodes, pushed, a)
    # a's dir bid + f2's bid remain; f1's is pushed
    assert unpushed.count() == 2


def test_sql_views_surface(spark):
    """The whole engine is queryable with plain spark.sql once views
    are registered — the extended-ls query expressed as SQL."""
    from pufs_spark.catalog import views
    from pufs_spark.plans import fstree
    from tests.conftest import SF_DIR

    names = views.register_views(
        spark, fstree.fs_nodes(spark, SF_DIR), fstree.fs_regions(spark, SF_DIR)
    )
    assert names == ["pufs_nodes", "pufs_regions", "pufs_mask", "pufs_blocks"]
    out = spark.sql(
        """
        SELECT n.name, n.size, coalesce(b.populated_size, 0) AS cached
        FROM pufs_nodes n
        LEFT JOIN pufs_blocks b ON n.bid = b.bid
        WHERE n.parent = 10 AND NOT n.is_dir
        ORDER BY n.name
        """
    ).collect()
    assert len(out) == 0 or all(r["cached"] >= 0 for r in out)
    # mask view is disjoint per bid
    bad = spark.sql(
        """
        SELECT count(*) AS n FROM (
          SELECT bid, start,
                 lag(`end`) OVER (PARTITION BY bid ORDER BY start) AS pe
          FROM pufs_mask)
        WHERE pe IS NOT NULL AND start < pe
        """
    ).collect()[0]["n"]
    assert bad == 0
