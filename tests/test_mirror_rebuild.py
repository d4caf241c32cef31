"""The mirror's wholesale arms, distributed (r6 verdict tasks 1+6):

- the Spark bucket/top-group expressions must agree with the Python
  rule on every path shape (they define bucket membership for the
  executor-side writer AND the driver-side delta fold — drift would
  corrupt the mirror silently);
- a checkpoint fold must run WITHOUT materializing the catalog in a
  driver dict (the r6 verdict's last driver-memory ceiling) and
  produce a state identical to the driver-dict fallback;
- a catalog that outgrows its bucket count must re-bucket once
  (size-triggered, executor-side, same commit version) and then be
  O(changed) again at the new count.
"""

import os

import pytest

from pufs_spark.catalog.datastore import ROOT_INODE
from pufs_spark.streaming import mirror as M


def _mk_catalog(tmp_path, n_top=8, n_sub=12):
    from pufs_spark.catalog import commitlog as CL

    root = str(tmp_path / "cat")
    w, log = CL.open_log(root)
    for i in range(n_top):
        d = w.mkdir(ROOT_INODE, f"top{i}")
        for j in range(n_sub):
            w.add_immutable_bytes(d, f"f{j}", b"x" * (j + 1))
    log.commit(w)  # v0: checkpoint
    return root, w, log


def _refresh(spark, root, mdir, ckpt, **kw):
    q = M.start_catalog_mirror(spark, root, mdir, ckpt, **kw)
    q.awaitTermination(120)


def test_bucket_exprs_match_python_rule(spark):
    paths = [
        "/", "/a", "/a/b", "/a/b/c", "/a/b/c/d/e", "/top0/f3",
        "/x" * 30, "/single", "/a b/c d", "/データ/ファイル/深い",
        "/.hidden/x", "/-/-", "/0/1/2/3",
    ]
    for n_buckets in (4, 64, 256):
        df = spark.createDataFrame([(p,) for p in paths], "path string")
        got = {
            r["path"]: (r["b"], r["g"])
            for r in df.select(
                "path",
                M._bucket_expr(n_buckets).alias("b"),
                M._top_group_expr().alias("g"),
            ).collect()
        }
        for p in paths:
            assert got[p] == (M._bucket(p, n_buckets), M._top_group(p)), (
                p, n_buckets, got[p],
            )


def test_checkpoint_rebuild_runs_distributed_and_matches_driver_arm(
    spark, tmp_path, monkeypatch
):
    root, w, log = _mk_catalog(tmp_path)
    mdir_d = str(tmp_path / "mirror_dist")
    mdir_p = str(tmp_path / "mirror_py")

    # driver-arm reference fold (no spark): the dict fallback
    from pufs_spark.sources.datasource import CDC_SCHEMA, PufsCommitsStreamReader

    fields = [c.split()[0] for c in CDC_SCHEMA.split(", ")]
    rdr = PufsCommitsStreamReader({"root": root})
    rows = [
        dict(zip(fields, t))
        for t in rdr.readBetweenOffsets({"version": 0}, {"version": 1})
    ]
    M._fold_rows(root, mdir_p, rows, spark=None)

    # distributed fold: the driver dict must NEVER build, and the
    # delta loader must never be asked for every bucket
    def no_dict(*a, **kw):
        raise AssertionError("checkpoint fold built the driver dict")

    real_load = M._load_buckets
    loads = []

    def counted_load(state_dir, bucket_ids, n_buckets):
        loads.append(len(set(bucket_ids)))
        return real_load(state_dir, bucket_ids, n_buckets)

    monkeypatch.setattr(M, "_rebuild_state", no_dict)
    monkeypatch.setattr(M, "_load_buckets", counted_load)
    _refresh(spark, root, mdir_d, str(tmp_path / "ckpt"))
    assert all(n < M.N_BUCKETS for n in loads), loads

    # state equivalence: same rows, same per-bucket files, same summary
    def state(mdir):
        _v, sd, _n, summary = M._resolve_state(mdir)
        per_bucket = {
            f: sorted(
                M._load_buckets(sd, [int(f[7:11])], M.N_BUCKETS).items()
            )
            for f in os.listdir(sd)
            if f.startswith("bucket-")
        }
        return per_bucket, summary

    got, got_sum = state(mdir_d)
    want, want_sum = state(mdir_p)
    assert got == want and got_sum == want_sum
    assert M.mirror_version(mdir_d) == M.mirror_version(mdir_p) == 0

    # and a delta folds on top of the distributed-built state
    t0 = w.resolve_path("/top0")
    w.add_immutable_bytes(t0, "after", b"delta")
    log.commit(w)
    _refresh(spark, root, mdir_d, str(tmp_path / "ckpt"))
    mirror_paths = {
        r["path"] for r in M.read_mirror(spark, mdir_d).collect()
    }
    assert "/top0/after" in mirror_paths
    assert len(mirror_paths) == 1 + 8 + 8 * 12 + 1


def test_checkpoint_with_trailing_deltas_in_one_batch(spark, tmp_path):
    """A single micro-batch holding [checkpoint v0, delta v1, delta v2]
    must rebuild at v0 distributed and fold v1/v2 bucket-locally on
    top — the recursion seam."""
    root, w, log = _mk_catalog(tmp_path, n_top=3, n_sub=4)
    t0 = w.resolve_path("/top0")
    w.add_immutable_bytes(t0, "d1", b"1")
    log.commit(w)  # v1 delta
    w.remove(w.resolve_path("/top1"), "f0")
    log.commit(w)  # v2 delta
    mdir = str(tmp_path / "mirror")
    _refresh(spark, root, mdir, str(tmp_path / "ckpt"))
    paths = {r["path"] for r in M.read_mirror(spark, mdir).collect()}
    assert "/top0/d1" in paths and "/top1/f0" not in paths
    assert M.mirror_version(mdir) == 2


def test_rebucket_migration_then_o_changed_at_new_count(spark, tmp_path):
    root, w, log = _mk_catalog(tmp_path, n_top=16, n_sub=24)
    mdir = str(tmp_path / "mirror")
    ckpt = str(tmp_path / "ckpt")
    # initial mirror at a deliberately small bucket count, no trigger
    _refresh(spark, root, mdir, ckpt, n_buckets=4)
    v, sd, n, _ = M._resolve_state(mdir)
    assert n == 4
    total = sum(
        os.path.getsize(os.path.join(sd, f))
        for f in os.listdir(sd)
        if f.startswith("bucket-")
    )

    # threshold the 4-bucket state exceeds but the 16-bucket state
    # won't: just under total/4 (post-migration bytes grow only by
    # per-file parquet overhead, far below the 4× headroom)
    thr = total // 4 - 1
    assert M.maybe_rebucket(spark, mdir, max_bucket_bytes=thr) == 16
    v2, sd2, n2, _ = M._resolve_state(mdir)
    assert (v2, n2) == (v, 16) and sd2 != sd
    assert os.path.basename(sd2).endswith("r16")
    # once: the trigger must not fire again at the new count
    assert M.maybe_rebucket(spark, mdir, max_bucket_bytes=thr) is None

    # readers resolve the re-bucketed state through the meta pointer
    from pufs_spark import serving

    snap = serving.MirrorStore(mdir).snapshot()
    assert snap.n_buckets == 16 and snap.version == v
    assert snap.lookup("/top3/f5") == (False, 6, snap.lookup("/top3/f5")[2])
    assert {n_ for n_, _ in snap.list_dir("/top2")} == {
        f"f{j}" for j in range(24)
    }

    # a 1-path delta at the new count rewrites ≤3 buckets, links the rest
    prev_inodes = {
        f: os.stat(os.path.join(sd2, f)).st_ino for f in os.listdir(sd2)
    }
    t0 = w.resolve_path("/top0")
    w.add_immutable_bytes(t0, "post_migration", b"delta")
    log.commit(w)
    _refresh(spark, root, mdir, ckpt, max_bucket_bytes=thr)
    _v3, sd3, n3, _ = M._resolve_state(mdir)
    assert n3 == 16  # the migrated count is pinned in meta
    fresh = [
        f
        for f in os.listdir(sd3)
        if f.startswith("bucket-")  # sidecars are rewritten per fold
        and os.stat(os.path.join(sd3, f)).st_ino != prev_inodes.get(f)
    ]
    assert len(fresh) <= 2, fresh
    paths = {r["path"] for r in M.read_mirror(spark, mdir).collect()}
    assert "/top0/post_migration" in paths
    assert len(paths) == 1 + 16 + 16 * 24 + 1

    # old pre-migration dir is pruned by now; only current+prev remain
    states = [d for d in os.listdir(mdir) if d.startswith("state-")]
    assert len(states) <= 2


def test_mirror_equals_materialize_after_rebucket(spark, tmp_path):
    """The chaos invariant, across a migration: mirror ≡ materialize
    at rest, before and after a re-bucket."""
    from pufs_spark.catalog import commitlog as CL
    from pufs_spark.catalog.datastore import DataStore

    root, w, log = _mk_catalog(tmp_path, n_top=6, n_sub=8)
    mdir = str(tmp_path / "mirror")
    ckpt = str(tmp_path / "ckpt")
    _refresh(spark, root, mdir, ckpt, n_buckets=4)
    assert M.maybe_rebucket(spark, mdir, max_bucket_bytes=1) == 16

    log2 = CL.CommitLog(root)
    store = DataStore.load(root, catalog_file=log2.materialize(0))
    want = set()

    def visit(inode, base):
        for name, child in store.get_dir_contents(inode):
            p = (base if base != "/" else "") + "/" + name
            want.add(p)
            if store.get_node(child).is_dir:
                visit(child, p)

    visit(ROOT_INODE, "/")
    want.add("/")
    got = {r["path"] for r in M.read_mirror(spark, mdir).collect()}
    assert got == want


def test_root_absent_wipes_without_loading_buckets(spark, tmp_path, monkeypatch):
    """An absent of "/" makes everything before it dead — the fold
    must start from empty state and LOAD no buckets (the old code
    faulted the whole catalog into the driver dict just to delete
    it), while upserts in LATER versions of the same batch still
    land."""
    from pufs_spark.sources.datasource import CDC_SCHEMA, PufsCommitsStreamReader

    root, w, log = _mk_catalog(tmp_path, n_top=6, n_sub=8)
    mdir = str(tmp_path / "mirror")
    _refresh(spark, root, mdir, str(tmp_path / "ckpt"))
    assert M.mirror_version(mdir) == 0

    # hand-fold a synthetic batch: [absent "/" @v1, upserts @v2] —
    # remove() refuses non-empty dirs, so inject the CDC-shaped rows
    # directly (the payload shape IS the contract; same technique as
    # the dead-claim and depth-1-absent tests)
    fields = [c.split()[0] for c in CDC_SCHEMA.split(", ")]

    def row(version, change, path, is_dir=None, size=None, bid=None):
        return dict(zip(fields, (version, 0.0, "t", "delta", change, path,
                                 is_dir, size, bid)))

    batch = [
        row(1, "absent", "/"),
        row(2, "upsert", "/", True, 0, None),
        row(2, "upsert", "/fresh", True, 0, None),
        row(2, "upsert", "/fresh/a", False, 7, "bid-a"),
    ]

    def no_load(*a, **kw):
        raise AssertionError("root-absent fold loaded buckets")

    monkeypatch.setattr(M, "_load_buckets", no_load)
    M._fold_rows(root, mdir, batch, spark=spark)
    monkeypatch.undo()

    assert M.mirror_version(mdir) == 2
    got = {
        r["path"]: (r["is_dir"], r["size"])
        for r in M.read_mirror(spark, mdir).collect()
    }
    assert got == {"/": (True, 0), "/fresh": (True, 0), "/fresh/a": (False, 7)}

    # and a later ordinary delta still folds bucket-locally
    t = M._resolve_state(mdir)
    batch2 = [row(3, "upsert", "/fresh/b", False, 3, "bid-b")]
    M._fold_rows(root, mdir, batch2, spark=spark)
    assert "/fresh/b" in {
        r["path"] for r in M.read_mirror(spark, mdir).collect()
    }
    assert M._resolve_state(mdir)[2] == t[2]  # bucket count unchanged


def test_root_absent_inside_checkpoint_batch_driver_arm(tmp_path):
    """The spark-less fallback: a batch holding [checkpoint v0,
    absent "/" v1, upsert v2] must end with ONLY the v2 content — the
    root absent must clear the rebuilt state (its children don't
    match a '//' prefix scan), not merely drop the root row."""
    from pufs_spark.sources.datasource import CDC_SCHEMA

    root, w, log = _mk_catalog(tmp_path, n_top=3, n_sub=4)
    mdir = str(tmp_path / "mirror")
    fields = [c.split()[0] for c in CDC_SCHEMA.split(", ")]

    def row(version, change, path, is_dir=None, size=None, bid=None):
        return dict(zip(fields, (version, 0.0, "t", "delta", change, path,
                                 is_dir, size, bid)))

    batch = [
        row(0, "checkpoint", None),
        row(1, "absent", "/"),
        row(2, "upsert", "/", True, 0, None),
        row(2, "upsert", "/only", False, 5, "bid-o"),
    ]
    M._fold_rows(root, mdir, batch, spark=None)
    assert M.mirror_version(mdir) == 2
    import pyarrow.parquet as pq

    _v, sd, n, _s = M._resolve_state(mdir)
    paths = set()
    for f in os.listdir(sd):
        if f.startswith("bucket-"):
            paths |= set(pq.read_table(os.path.join(sd, f))["path"].to_pylist())
    assert paths == {"/", "/only"}


def test_fold_replay_after_rebucket_keeps_migrated_state(spark, tmp_path):
    """foreachBatch replays the batch that produced version V AFTER a
    same-version re-bucket published state-Vr{n}. The replay must be a
    no-op: re-publishing the stale plain state-V dir (still on disk —
    keep_all skipped pruning) under the NEW bucket count would corrupt
    every bucket-local read."""
    from pufs_spark.sources.datasource import CDC_SCHEMA, PufsCommitsStreamReader

    root, w, log = _mk_catalog(tmp_path, n_top=6, n_sub=8)
    mdir = str(tmp_path / "mirror")
    fields = [c.split()[0] for c in CDC_SCHEMA.split(", ")]
    rdr = PufsCommitsStreamReader({"root": root})
    batch = [
        dict(zip(fields, t))
        for t in rdr.readBetweenOffsets({"version": 0}, {"version": 1})
    ]
    M._fold_rows(root, mdir, batch, n_buckets=4, spark=spark)
    assert M.maybe_rebucket(spark, mdir, max_bucket_bytes=1) == 16
    v, sd, n, _ = M._resolve_state(mdir)
    assert n == 16 and os.path.basename(sd).endswith("r16")
    stale_plain = M._state_dir(mdir, v)
    assert os.path.isdir(stale_plain)  # the hazard: old-rule dir survives

    # the at-least-once replay of the same batch
    M._fold_rows(root, mdir, batch, n_buckets=4, spark=spark)
    v2, sd2, n2, _ = M._resolve_state(mdir)
    assert (v2, sd2, n2) == (v, sd, 16)  # meta untouched

    # and reads still resolve through the migrated state
    from pufs_spark import serving

    snap = serving.MirrorStore(mdir).snapshot()
    assert snap.lookup("/top2/f3")[1] == 4
    assert len(snap.list_dir("/top1")) == 8
    paths = {r["path"] for r in M.read_mirror(spark, mdir).collect()}
    assert len(paths) == 1 + 6 + 6 * 8

    # a genuinely NEW delta still folds at the migrated count
    t0 = w.resolve_path("/top0")
    w.add_immutable_bytes(t0, "fresh", b"x")
    log.commit(w)
    rows2 = [
        dict(zip(fields, t))
        for t in rdr.readBetweenOffsets({"version": 1}, {"version": 2})
    ]
    M._fold_rows(root, mdir, rows2, n_buckets=4, spark=spark)
    _v3, _sd3, n3, _ = M._resolve_state(mdir)
    assert n3 == 16
    assert "/top0/fresh" in {
        r["path"] for r in M.read_mirror(spark, mdir).collect()
    }


def test_driver_arm_ignores_stale_checkpoint_replay(tmp_path, monkeypatch):
    """ADVICE r8: the spark-less arm must mirror the spark arm's
    ``vc <= prev_version`` guard. A batch carrying an already-folded
    checkpoint (v0) plus a newer delta (v2) — with the mirror at v1
    and v1's rows NOT in the batch — must fold only the v2 delta:
    rebuilding at v0 would silently drop v1's content."""
    from pufs_spark.sources.datasource import CDC_SCHEMA

    mdir = str(tmp_path / "mirror")
    fields = [c.split()[0] for c in CDC_SCHEMA.split(", ")]

    def row(version, change, path, is_dir=None, size=None, bid=None):
        return dict(zip(fields, (version, 0.0, "t", "delta", change, path,
                                 is_dir, size, bid)))

    M._fold_rows(str(tmp_path), mdir, [
        row(0, "upsert", "/", True, 0, None),
        row(0, "upsert", "/a", False, 1, "bid-a"),
        row(1, "upsert", "/b", False, 2, "bid-b"),
    ], spark=None)
    assert M.mirror_version(mdir) == 1

    def no_rebuild(*a, **kw):
        raise AssertionError("stale checkpoint triggered a rebuild")

    monkeypatch.setattr(M, "_rebuild_state", no_rebuild)
    M._fold_rows(str(tmp_path), mdir, [
        row(0, "checkpoint", None),
        row(2, "upsert", "/c", False, 3, "bid-c"),
    ], spark=None)
    assert M.mirror_version(mdir) == 2

    import pyarrow.parquet as pq

    _v, sd, _n, _s = M._resolve_state(mdir)
    paths = set()
    for f in os.listdir(sd):
        if f.startswith("bucket-"):
            paths |= set(pq.read_table(os.path.join(sd, f))["path"].to_pylist())
    assert paths == {"/", "/a", "/b", "/c"}
