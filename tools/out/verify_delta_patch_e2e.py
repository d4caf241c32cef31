"""E2E verify: serving answers stay correct ACROSS live folds over a
real TCP socket, with the fold's delta sidecar patching resident
buckets (no re-decode / no admission re-earn). Run from outside the
repo dir: python tools/out/verify_delta_patch_e2e.py"""
import sys

sys.path.insert(0, "/root/repo")

import pufs_spark  # noqa: E402
from pufs_spark import serving  # noqa: E402
from pufs_spark.catalog import commitlog as CL  # noqa: E402
from pufs_spark.catalog.datastore import ROOT_INODE  # noqa: E402
from pufs_spark.streaming import mirror as M  # noqa: E402


def main(tmp):
    import os

    spark = pufs_spark.get_spark(app_name="verify-delta-patch", cpus=4)
    root, mdir, ckpt = f"{tmp}/cat", f"{tmp}/mirror", f"{tmp}/ckpt"
    w, log = CL.open_log(root)
    d = w.mkdir(ROOT_INODE, "docs")
    for i in range(40):
        w.add_immutable_bytes(d, f"f{i:02d}", b"x" * (i + 1))
    log.commit(w)

    def refresh():
        q = M.start_catalog_mirror(spark, root, mdir, ckpt)
        q.awaitTermination(120)

    refresh()
    server, port = serving.serve_mirror(mdir)
    store = server.service.store if hasattr(server, "service") else None
    client = serving.PufsClient("127.0.0.1", port)
    try:
        r = client.get_dir_contents("/docs")
        assert r["errorMsg"] == "" and len(r["entries"]) == 40, r
        a0 = client.call(op="getattr", path="/docs/f03")
        assert a0["size"] == 4, a0

        # live fold: delete one file, add one, and REPLACE one in
        # place (same path, new size) — the replace guarantees its
        # bucket has both a previous and a new file, so the fold must
        # publish a delta sidecar for it
        w.remove(d, "f05")
        w.remove(d, "f03")
        w.add_immutable_bytes(d, "f03", b"REPLACED!")
        w.add_immutable_bytes(d, "g_new", b"fresh")
        log.commit(w)
        refresh()
        sd = M._resolve_state(mdir)[1]
        assert os.path.exists(os.path.join(sd, M.DELTA_FILE)), \
            "fold must publish a delta sidecar"

        r2 = client.get_dir_contents("/docs")
        names = {e["name"] for e in r2["entries"]}
        assert "f05" not in names, "deleted file still served"
        assert "g_new" in names, "new file missing"
        assert r2["mirrorVersion"] == 1, r2["mirrorVersion"]
        g = client.call(op="getattr", path="/docs/f05")
        assert "NotFoundError" in g.get("errorMsg", ""), g
        a3 = client.call(op="getattr", path="/docs/f03")
        assert a3["size"] == len(b"REPLACED!"), a3
        print("VERIFY-DELTA-PATCH-E2E OK")
    finally:
        client.close()
        server.shutdown()
        spark.stop()


if __name__ == "__main__":
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        main(tmp)
