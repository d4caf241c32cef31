"""End-to-end verify: package boundary + served mirror with hot-bucket
admission under a tight cap (run from /tmp, not the repo cwd)."""
import sys

sys.path.insert(0, "/root/repo")

import threading

import pufs_spark  # noqa: F401  (package boundary)
from pufs_spark import serving
from pufs_spark.session import get_spark
from pufs_spark.sources.datasource import CDC_SCHEMA
from pufs_spark.streaming import mirror as M

spark = get_spark(app_name="verify-admission", cpus=4)
fields = [c.split()[0] for c in CDC_SCHEMA.split(", ")]


def row(version, change, path, is_dir=None, size=None, bid=None):
    return dict(zip(fields, (version, 0.0, "t", "delta", change, path,
                             is_dir, size, bid)))


import tempfile

tmp = tempfile.mkdtemp(dir="/root/repo/tools/out")
mdir = f"{tmp}/mirror"
batch = [row(1, "upsert", "/", True, 0, None)]
for i in range(8):
    batch.append(row(1, "upsert", f"/d{i}", True, 0, None))
    for j in range(60):
        batch.append(row(1, "upsert", f"/d{i}/f{j:02d}", False,
                         i * 100 + j, f"b-{i}-{j}"))
M._fold_rows(f"{tmp}/cat", mdir, batch, spark=spark)

# serve over a real socket; point-read mode on every bucket, admission
# enabled with the instance floor, cap shrunk after the first admit
store = serving.MirrorStore(mdir, point_read_bytes=0)
store.POINT_ADMIT_AFTER = 2
srv = serving.PufsServer(serving.MirrorService(store), "127.0.0.1", 0)
threading.Thread(target=srv.serve_forever, daemon=True).start()
port = srv.server_address[1]

from pufs_spark.serving import PufsClient

c = PufsClient("127.0.0.1", port)
for _ in range(3):
    r = c.call(op="getattr", path="/d5/f11")
assert r["size"] == 511, r
resident = store.cached_bytes()
assert resident > 0, "hot bucket must admit over the wire"
store.max_cache_bytes = resident + 10
store.EST_DECODED_BYTES_PER_ROW = 0  # force pre-check pass
for _ in range(4):
    r2 = c.call(op="getattr", path="/d3/f07")
assert r2["size"] == 307, r2
assert store.cached_bytes() == resident, "no-evict insert must drop"
ls = c.call(op="get_dir_contents", path="/d3")
assert len(ls["entries"]) == 60, len(ls["entries"])
srv.shutdown()
spark.stop()

import shutil

shutil.rmtree(tmp, ignore_errors=True)
print("VERIFY-ADMISSION-E2E OK")
