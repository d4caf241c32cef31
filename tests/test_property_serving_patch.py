"""Property test for the fold delta-sidecar cache patch (r10): a
serving cache that only ever PATCHES residents forward must stay
byte-identical to one that decodes fresh parquet, across arbitrary
fold sequences — rows, kids index, and est accounting alike. The
fold's plain-delta arm is driver-side (no SparkSession), so this runs
Spark-free and fast enough for Hypothesis.

Covers the state space the example tests can't: upserts/absents mixed
in one version, subtree absents, depth-1 absents resolved through the
top-group summary superset (zero-change bucket rewrites → sidecar
re-stamp entries), re-upserts of identical rows, paths colliding into
shared buckets, and multi-fold sequences where residents are one OR
two folds behind (Hypothesis also chooses, per fold, whether the
warmed store observes it — skipped folds exercise the two-step
sidecar chain; runs of 2+ skipped folds exercise the reload
fallback)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pufs_spark import serving
from pufs_spark.catalog import errors as CE
from pufs_spark.streaming import mirror as M

TOPS = ["a", "b", "c"]
NAMES = ["x", "y", "z", "w"]


def _paths():
    # depths 1-3 over a tiny alphabet: heavy bucket collisions AND
    # plenty of depth-1 absents (the summary-superset arm)
    return st.one_of(
        st.sampled_from([f"/{t}" for t in TOPS]),
        st.sampled_from([f"/{t}/{n}" for t in TOPS for n in NAMES]),
        st.sampled_from(
            [f"/{t}/{n}/{m}" for t in TOPS for n in NAMES[:2]
             for m in NAMES[:2]]
        ),
    )


_ops = st.lists(
    st.tuples(
        st.sampled_from(["upsert", "absent"]),
        _paths(),
        st.booleans(),                      # is_dir
        st.integers(min_value=0, max_value=99),  # size
    ),
    min_size=1,
    max_size=6,
)

_folds = st.lists(
    st.tuples(_ops, st.booleans()),  # (ops, observe this fold?)
    min_size=1,
    max_size=5,
)


def _rows_for(version: int, ops) -> list[dict]:
    rows = []
    for change, path, is_dir, size in ops:
        rows.append({
            "version": version, "ts": 0.0, "writer": "t", "kind": "delta",
            "change": change, "path": path,
            "is_dir": is_dir if change == "upsert" else None,
            "size": size if change == "upsert" else None,
            "bid": None,
        })
    # every fold also upserts "/" so the catalog is never empty-rooted
    rows.append({
        "version": version, "ts": 0.0, "writer": "t", "kind": "delta",
        "change": "upsert", "path": "/", "is_dir": True, "size": 0,
        "bid": None,
    })
    return rows


ALL_PATHS = (
    ["/"]
    + [f"/{t}" for t in TOPS]
    + [f"/{t}/{n}" for t in TOPS for n in NAMES]
    + [f"/{t}/{n}/{m}" for t in TOPS for n in NAMES[:2] for m in NAMES[:2]]
)


@settings(max_examples=120, deadline=None)
@given(folds=_folds)
def test_patched_store_equals_fresh_decode(tmp_path_factory, folds):
    tmp = tmp_path_factory.mktemp("pmirror")
    mdir = str(tmp / "mirror")
    warmed = serving.MirrorStore(mdir)
    for v, (ops, observe) in enumerate(folds, start=1):
        M._fold_rows(str(tmp / "cat"), mdir, _rows_for(v, ops))
        if not observe and v < len(folds):
            continue  # leave residents >=2 folds behind
        fresh = serving.MirrorStore(mdir)
        fsnap, wsnap = fresh.snapshot(), warmed.snapshot()
        assert wsnap.version == v
        for p in ALL_PATHS:
            try:
                want = fsnap.lookup(p)
            except CE.NotFoundError:
                want = None
            try:
                got = wsnap.lookup(p)
            except CE.NotFoundError:
                got = None
            assert got == want, (v, p, got, want)
            if want is not None and want[0]:
                assert sorted(wsnap.list_dir(p)) == sorted(fsnap.list_dir(p)), \
                    (v, p)
        # internals: every resident equals a fresh decode of the same
        # file — rows, kids (order-free), and the est accounting
        sd = M._resolve_state(mdir)[1]
        for fname, (sig, rows, kids, est) in list(warmed._cache.items()):
            frows, fkids = fresh._bucket_entry(sd, fname)
            assert rows == frows, (v, fname)
            assert (
                {k: sorted(x) for k, x in kids.items() if x}
                == {k: sorted(x) for k, x in fkids.items() if x}
            ), (v, fname)
            assert est == serving.MirrorStore._entry_bytes(rows), (v, fname)
        assert warmed._cache_bytes == sum(
            e[3] for e in warmed._cache.values()
        )
