"""Physical-plan regression tests: the properties that matter at 100TB
— predicate pushdown to the parquet scan, column pruning in ReadSchema,
broadcast joins for small dimensions, no accidental cartesian products,
and bounded shuffle counts. These assert on .explain output so a plan
regression fails CI, not a profiling session."""

from __future__ import annotations

import importlib.util
import os
import re

import pytest

# Plan assertions target the COLD plans: parquet pushdown and pruning
# must hold even without the entry module's memoized/persisted FS
# derivations (which would wrap the scans in InMemoryRelation).
os.environ["PUFS_ENTRY_CACHE"] = "0"

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
entrymod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entrymod)

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def n_nodes(plan: str, op: str) -> int:
    """Count physical operators via their detail entries — formatted
    explain prints each node twice (tree + `(n) Op` detail)."""
    return len(re.findall(rf"\(\d+\) {op}", plan))


def test_q1_pushdown_and_pruning(spark):
    plan = plan_of(spark, "Q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # filter reached the scan
    # column pruning: untouched lineitem columns never leave the scan
    assert "l_partkey" not in plan and "l_suppkey" not in plan
    assert "HashAggregate" in plan  # partial+final agg, not sort-agg


def test_q3_broadcasts_dimensions(spark):
    plan = plan_of(spark, "Q3_shipping_priority")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # dim filter pushed


def test_q5_no_shuffle_joins_for_dims(spark):
    plan = plan_of(spark, "Q5_local_supplier")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q6_all_filters_pushed(spark):
    plan = plan_of(spark, "Q6_forecast_revenue")
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({frag})" in plan or frag in plan
    assert "GreaterThanOrEqual(l_shipdate,1997-01-01" in plan


def test_l1_impossible_branches_pruned(spark):
    """parent==4 constant-folds the root and region branches of the
    derived-tree union away entirely."""
    plan = plan_of(spark, "L1_dir_listing")
    assert 1 <= n_nodes(plan, "Scan parquet") <= 4  # region+root branches gone


def test_d1_no_cartesian(spark):
    """LSH banding must candidate via equality joins, never all-pairs."""
    plan = plan_of(spark, "D1_minhash_lsh_neardup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_r1_hash_join_and_single_mask_merge(spark):
    """missing_regions: the mask join must hash on the bid equality key
    (never BNLJ — the range predicates ride as join-condition filters),
    and the sentinel rewrite must plan the expensive mask merge exactly
    once (the two-arm head/tail union recomputed it per arm, the r4
    bench regression: 1.5s -> 3.0s)."""
    plan = plan_of(spark, "R1_missing_regions")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert (
        n_nodes(plan, "BroadcastHashJoin")
        + n_nodes(plan, "SortMergeJoin")
        + n_nodes(plan, "ShuffledHashJoin")
        >= 1
    )
    # one island-merge pipeline = exactly two Window nodes from
    # merge_intervals (prev-max-end + island-sum) plus one lag sweep.
    assert n_nodes(plan, "Window") == 3


def test_e1_single_shuffle_for_session_agg(spark):
    """The window partitions by user_id and the session aggregate groups
    by (user_id, session_id): hash-partitioning on user_id satisfies
    both, so there must be exactly one exchange."""
    plan = plan_of(spark, "E1_sessionize")
    assert n_nodes(plan, "Exchange") == 1


def test_f1_no_exponential_plan(spark):
    """Freeze materializes per-level results; the final plan must stay
    small (the unmaterialized variant grows ~2^levels scans)."""
    plan = plan_of(spark, "F1_merkle_freeze")
    assert n_nodes(plan, "Scan parquet") + n_nodes(plan, "Scan ExistingRDD") < 25


def test_r2_one_shuffle(spark):
    """Interval merge: one shuffle on bid; groupBy(bid, island) reuses
    the window's partitioning."""
    plan = plan_of(spark, "R2_interval_union")
    assert n_nodes(plan, "Exchange") == 1
    assert n_nodes(plan, "Sort") == 1  # both windows share one sort


def test_t13_two_exchanges_and_digest_shuffle(spark):
    """Paragraph dedup: exactly two shuffles (digest-keyed count agg +
    per-doc regroup); the dup set joins broadcast, never shuffled."""
    plan = plan_of(spark, "T13_dedup_paragraphs")
    assert n_nodes(plan, "Exchange") == 2
    assert "CartesianProduct" not in plan


def test_t14_single_shard_exchange(spark):
    """Sequence packing: one hash exchange on the md5 shard key feeding
    one per-shard window sort — no global sort task."""
    plan = plan_of(spark, "T14_pack_sequences")
    assert n_nodes(plan, "Exchange") == 1
    assert n_nodes(plan, "Sort") == 1
    assert n_nodes(plan, "Window") == 1


@pytest.mark.parametrize(
    "name",
    [
        "L3_extended_listing",
        "W1_rank_per_group",
        "G1_rollup",
        "Q4_exists_priority",
        "S2_embedding_neardup",
        "S1_cosine_topk",
    ],
)
def test_no_cartesian_anywhere(spark, name):
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan
