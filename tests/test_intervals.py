"""Interval-algebra tests ported from the reference's
region/region_test.go, including the two production-log regressions
(FIXTURES.md §4)."""

import pytest

from pufs_spark.operators import intervals


def mk(spark, rows):
    return spark.createDataFrame(rows, "bid string, start long, end long")


def mkq(spark, rows):
    return spark.createDataFrame(
        rows, "bid string, qid long, qstart long, qend long"
    )


def collect_mask(df):
    return sorted(
        (r["bid"], r["start"], r["end"]) for r in df.collect()
    )


def test_merge_adjacent(spark):
    # region_test.go:11-33 — end-adjacent intervals merge
    df = mk(spark, [("b", 0, 5), ("b", 5, 10)])
    assert collect_mask(intervals.merge_intervals(df)) == [("b", 0, 10)]


def test_merge_overlap_and_disjoint(spark):
    df = mk(spark, [("b", 0, 5), ("b", 3, 8), ("b", 20, 30), ("c", 1, 2)])
    assert collect_mask(intervals.merge_intervals(df)) == [
        ("b", 0, 8),
        ("b", 20, 30),
        ("c", 1, 2),
    ]


def test_merge_middle_insert(spark):
    # region_test.go:128-147 — middle insert bridging two islands
    df = mk(spark, [("b", 0, 5), ("b", 10, 15), ("b", 4, 11)])
    assert collect_mask(intervals.merge_intervals(df)) == [("b", 0, 15)]


def test_missing_regions_basic(spark):
    mask = intervals.merge_intervals(mk(spark, [("b", 0, 100), ("b", 200, 300)]))
    q = mkq(spark, [("b", 1, 50, 250), ("b", 2, 0, 400), ("c", 3, 0, 10)])
    gaps = sorted(
        (r["bid"], r["qid"], r["start"], r["end"])
        for r in intervals.missing_regions(mask, q).collect()
    )
    assert gaps == [
        ("b", 1, 100, 200),
        ("b", 2, 100, 200),
        ("b", 2, 300, 400),
        ("c", 3, 0, 10),  # nothing cached for c: whole query missing
    ]


def test_missing_regions_fully_covered(spark):
    mask = intervals.merge_intervals(mk(spark, [("b", 0, 100)]))
    q = mkq(spark, [("b", 1, 10, 90)])
    assert intervals.missing_regions(mask, q).count() == 0


def test_production_regression_covered_chunk(spark):
    # region_test.go:59-126 — mask from production logs; querying an
    # exactly-covered chunk yields no gaps
    mask = intervals.merge_intervals(
        mk(
            spark,
            [
                ("b", 7168000, 7372800),
                ("b", 7782400, 7987200),
                ("b", 8806400, 9011200),
            ],
        )
    )
    q = mkq(spark, [("b", 1, 7168000, 7372800)])
    assert intervals.missing_regions(mask, q).count() == 0
    # and the hole between islands is reported
    q2 = mkq(spark, [("b", 2, 7168000, 7987200)])
    gaps = [
        (r["start"], r["end"])
        for r in intervals.missing_regions(mask, q2).collect()
    ]
    assert gaps == [(7372800, 7782400)]


def test_coverage_stats(spark):
    mask = intervals.merge_intervals(
        mk(spark, [("b", 0, 5), ("b", 5, 10), ("b", 20, 30), ("c", 0, 1)])
    )
    stats = {
        r["bid"]: (r["populated_region_count"], r["populated_size"])
        for r in intervals.coverage_stats(mask).collect()
    }
    assert stats == {"b": (2, 20), "c": (1, 1)}


def test_add_region_and_validate(spark):
    log = mk(spark, [("b", 0, 5)])
    merged = intervals.add_region(log, mk(spark, [("b", 3, 9), ("b", 15, 20)]))
    assert collect_mask(merged) == [("b", 0, 9), ("b", 15, 20)]
    assert intervals.validate_mask(merged).count() == 0
    # a deliberately broken mask is flagged
    bad = mk(spark, [("b", 0, 5), ("b", 4, 9)])
    assert intervals.validate_mask(bad).count() == 1


def test_align_chunks(spark):
    chunk = 200 * 1024  # reference chunk size, core/datastore.go:106
    q = spark.createDataFrame(
        [("b", 1, 100, 250_000, 300_000)],
        "bid string, qid long, qstart long, qend long, block_size long",
    )
    aligned = intervals.align_chunks(q, chunk, max_size_col="block_size").collect()[0]
    assert aligned["qstart"] == 0
    assert aligned["qend"] == 300_000  # 2 chunks = 409600, clamped to size


def test_first_missing_and_next_start(spark):
    mask = intervals.merge_intervals(mk(spark, [("b", 10, 20), ("b", 40, 50)]))
    q = mkq(spark, [("b", 1, 0, 100)])
    fm = intervals.first_missing(mask, q).collect()[0]
    assert (fm["start"], fm["end"]) == (0, 10)
    pos = spark.createDataFrame([("b", 15)], "bid string, position long")
    ns = intervals.next_start(mask, pos).collect()[0]
    assert ns["next_start"] == 40


def test_next_start_reports_absence_as_null(spark):
    """A position past the last interval still yields a row, with
    next_start NULL — matching the reference's GetNextStart, which
    reports absence rather than dropping the query."""
    mask = intervals.merge_intervals(mk(spark, [("b", 10, 20)]))
    pos = spark.createDataFrame(
        [("b", 500), ("b", 5), ("nokey", 0)], "bid string, position long"
    )
    rows = {
        (r["bid"], r["position"]): r["next_start"]
        for r in intervals.next_start(mask, pos).collect()
    }
    assert rows[("b", 500)] is None  # nothing at/after 500
    assert rows[("b", 5)] == 10
    assert rows[("nokey", 0)] is None  # key absent from mask entirely
    assert len(rows) == 3


@pytest.mark.parametrize("n", [1000])
def test_merge_scales_disjoint_keys(spark, n):
    # many keys merge independently (per-key partitioning, no cross-key
    # interference)
    rows = [(f"b{i % 50}", i * 10, i * 10 + 5) for i in range(n)]
    merged = intervals.merge_intervals(mk(spark, rows))
    assert merged.count() == n  # all disjoint


# ---------------------------------------------------------------------------
# Randomized model-vs-Spark properties: hundreds of cases batched into
# ONE job (each case is a distinct bid/qid partition), compared against
# a plain-Python interval model.
# ---------------------------------------------------------------------------


def _model_merge(ranges):
    out = []
    for s, e in sorted(ranges):
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


def _model_missing(mask, qs, qe):
    gaps, pos = [], qs
    for s, e in mask:
        if e <= pos:
            continue
        if s >= qe:
            break
        if s > pos:
            gaps.append((pos, min(s, qe)))
        pos = max(pos, e)
        if pos >= qe:
            break
    if pos < qe:
        gaps.append((pos, qe))
    return gaps


def test_merge_matches_model_randomized(spark):
    import random

    rnd = random.Random(20260813)
    cases = {}
    rows = []
    for c in range(300):
        n = rnd.randrange(1, 12)
        ranges = []
        for _ in range(n):
            s = rnd.randrange(0, 500)
            ranges.append((s, s + rnd.randrange(1, 120)))
        if rnd.random() < 0.3:
            ranges.append(rnd.choice(ranges))  # exact duplicates
        cases[f"c{c}"] = ranges
        rows += [(f"c{c}", s, e) for s, e in ranges]
    df = spark.createDataFrame(rows, "bid string, start long, `end` long")
    got = {}
    for r in intervals.merge_intervals(df).collect():
        got.setdefault(r["bid"], []).append((r["start"], r["end"]))
    for c, ranges in cases.items():
        assert sorted(got[c]) == _model_merge(ranges), f"case {c}: {ranges}"


def test_missing_matches_model_randomized(spark):
    import random

    rnd = random.Random(4242)
    mask_rows, q_rows, expect = [], [], {}
    for c in range(200):
        bid = f"m{c}"
        n = rnd.randrange(0, 8)
        ranges = []
        for _ in range(n):
            s = rnd.randrange(0, 400)
            ranges.append((s, s + rnd.randrange(1, 90)))
        mask = _model_merge(ranges)
        mask_rows += [(bid, s, e) for s, e in mask]
        qs = rnd.randrange(0, 300)
        qe = qs + rnd.randrange(1, 250)
        q_rows.append((bid, c, qs, qe))
        expect[(bid, c)] = _model_missing(mask, qs, qe)
    mask_df = spark.createDataFrame(
        mask_rows or [("none", 0, 1)], "bid string, start long, `end` long"
    )
    q_df = spark.createDataFrame(
        q_rows, "bid string, qid long, qstart long, qend long"
    )
    got = {}
    for r in intervals.missing_regions(mask_df, q_df).collect():
        got.setdefault((r["bid"], r["qid"]), []).append((r["start"], r["end"]))
    for key, exp in expect.items():
        assert sorted(got.get(key, [])) == exp, f"case {key}"
