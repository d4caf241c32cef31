"""Sparse chunk cache tests — ports of the reference's freezer/pending
behavior (partial reads core/freezer_test.go:120-162, persistence
across restart core/freezer_test.go:72-118, request coalescing
region/pending.go:281-299)."""

from __future__ import annotations

import os

import pytest

from pufs_spark.sources import sparse
from pufs_spark.sources.remote import MemRemote


class CountingRemote:
    """Wraps a remote, counting bytes served — the read-accounting
    oracle for zero-re-read assertions."""

    def __init__(self, inner, counter_path: str):
        self.inner = inner
        self.counter_path = counter_path

    def read_block(self, bid, offset, length):
        data = self.inner.read_block(bid, offset, length)
        with open(self.counter_path, "a") as f:
            f.write(f"{len(data)}\n")
        return data


def _counted(counter_path: str) -> int:
    if not os.path.exists(counter_path):
        return 0
    with open(counter_path) as f:
        return sum(int(line) for line in f if line.strip())


CHUNK = 1024  # small chunk for tests (reference default is 200KB)


@pytest.fixture()
def remote_with_block(tmp_path):
    remote = MemRemote()
    data = bytes(i % 251 for i in range(10 * CHUNK + 123))  # non-aligned size
    remote.blocks["blk1"] = data
    counter = str(tmp_path / "counter")
    return remote, data, counter


def _factory(remote, counter):
    def make():
        return CountingRemote(remote, counter)

    return make


def test_read_through_exact_bytes(spark, tmp_path, remote_with_block):
    remote, data, counter = remote_with_block
    root = str(tmp_path / "cache")
    got = sparse.read_through(
        spark, root, _factory(remote, counter), "blk1", 100, 5000,
        chunk_size=CHUNK, readahead=0,
    )
    assert got == data[100:5100]


def test_chunk_alignment_and_counts(spark, tmp_path, remote_with_block):
    remote, data, counter = remote_with_block
    root = str(tmp_path / "cache")
    reqs = spark.createDataFrame(
        [("blk1", 100, 200)], "bid string, qstart long, qend long"
    )
    stats = sparse.ensure_cached(
        spark, root, _factory(remote, counter), reqs, chunk_size=CHUNK
    )
    # [100, 200) aligns to exactly one chunk [0, 1024)
    assert stats == {"chunks_fetched": 1, "bytes_fetched": CHUNK}
    fz = sparse.SparseFreezer(root)
    assert fz.regions("blk1") == [(0, CHUNK)]


def test_second_run_fetches_nothing(spark, tmp_path, remote_with_block):
    remote, data, counter = remote_with_block
    root = str(tmp_path / "cache")
    reqs = spark.createDataFrame(
        [("blk1", 0, 3000), ("blk1", 2500, 4000)],
        "bid string, qstart long, qend long",
    )
    s1 = sparse.ensure_cached(
        spark, root, _factory(remote, counter), reqs, chunk_size=CHUNK
    )
    assert s1["chunks_fetched"] == 4  # [0,4096) = 4 chunks, overlap coalesced
    before = _counted(counter)
    s2 = sparse.ensure_cached(
        spark, root, _factory(remote, counter), reqs, chunk_size=CHUNK
    )
    assert s2 == {"chunks_fetched": 0, "bytes_fetched": 0}
    assert _counted(counter) == before  # zero remote bytes on re-run


def test_persistence_across_restart(spark, tmp_path, remote_with_block):
    """Reference core/freezer_test.go:72-118: a NEW freezer instance
    over the same root replays the region log and re-reads nothing."""
    remote, data, counter = remote_with_block
    root = str(tmp_path / "cache")
    reqs = spark.createDataFrame(
        [("blk1", 0, 2048)], "bid string, qstart long, qend long"
    )
    sparse.ensure_cached(spark, root, _factory(remote, counter), reqs, chunk_size=CHUNK)
    before = _counted(counter)
    # "restart": fresh SparseFreezer + fresh ensure over same root
    fz2 = sparse.SparseFreezer(root)
    assert fz2.regions("blk1") == [(0, 2048)]
    assert fz2.read("blk1", 0, 2048) == data[:2048]
    s = sparse.ensure_cached(spark, root, _factory(remote, counter), reqs, chunk_size=CHUNK)
    assert s["bytes_fetched"] == 0
    assert _counted(counter) == before


def test_request_coalescing(spark, tmp_path, remote_with_block):
    """Overlapping concurrent requests → each chunk fetched once."""
    remote, data, counter = remote_with_block
    root = str(tmp_path / "cache")
    reqs = spark.createDataFrame(
        [("blk1", 0, 2000)] * 8 + [("blk1", 500, 2500)] * 8,
        "bid string, qstart long, qend long",
    )
    stats = sparse.ensure_cached(
        spark, root, _factory(remote, counter), reqs, chunk_size=CHUNK
    )
    assert stats["chunks_fetched"] == 3  # [0,3072), no duplicates


def test_readahead_extends_coverage(spark, tmp_path, remote_with_block):
    remote, data, counter = remote_with_block
    root = str(tmp_path / "cache")
    reqs = spark.createDataFrame(
        [("blk1", 0, 100)], "bid string, qstart long, qend long"
    )
    sparse.ensure_cached(
        spark, root, _factory(remote, counter), reqs,
        chunk_size=CHUNK, readahead=3 * CHUNK,
    )
    fz = sparse.SparseFreezer(root)
    (s, e), = fz.regions("blk1")
    assert s == 0 and e >= 4 * CHUNK  # request + readahead window


def test_eof_tail_is_idempotent(spark, tmp_path, remote_with_block):
    """Requesting past end-of-block must not re-fetch forever: the short
    final chunk is logged as complete and reads clamp at EOF."""
    remote, data, counter = remote_with_block
    root = str(tmp_path / "cache")
    n = len(data)
    reqs = spark.createDataFrame(
        [("blk1", n - 50, n + 5000)], "bid string, qstart long, qend long"
    )
    s1 = sparse.ensure_cached(
        spark, root, _factory(remote, counter), reqs, chunk_size=CHUNK
    )
    assert s1["chunks_fetched"] > 0
    s2 = sparse.ensure_cached(
        spark, root, _factory(remote, counter), reqs, chunk_size=CHUNK
    )
    assert s2 == {"chunks_fetched": 0, "bytes_fetched": 0}
    fz = sparse.SparseFreezer(root)
    assert fz.read("blk1", n - 50, 5050) == data[n - 50 :]


def test_sparse_file_has_holes(spark, tmp_path, remote_with_block):
    """Only requested chunks are materialized — the cache is sparse."""
    remote, data, counter = remote_with_block
    root = str(tmp_path / "cache")
    reqs = spark.createDataFrame(
        [("blk1", 9 * CHUNK, 9 * CHUNK + 100)],
        "bid string, qstart long, qend long",
    )
    stats = sparse.ensure_cached(
        spark, root, _factory(remote, counter), reqs, chunk_size=CHUNK
    )
    assert stats["chunks_fetched"] == 1
    fz = sparse.SparseFreezer(root)
    assert fz.read("blk1", 9 * CHUNK, 100) == data[9 * CHUNK : 9 * CHUNK + 100]
    with pytest.raises(ValueError):
        fz.read("blk1", 0, 100)  # head never fetched


def test_compaction(spark, tmp_path, remote_with_block):
    remote, data, counter = remote_with_block
    root = str(tmp_path / "cache")
    reqs = spark.createDataFrame(
        [("blk1", i * CHUNK, i * CHUNK + 10) for i in range(5)],
        "bid string, qstart long, qend long",
    )
    sparse.ensure_cached(spark, root, _factory(remote, counter), reqs, chunk_size=CHUNK)
    fz = sparse.SparseFreezer(root)
    assert len(fz.log_records("blk1")) == 5
    fz.compact("blk1")
    assert fz.log_records("blk1") == [(0, 5 * CHUNK)]
    assert fz.regions("blk1") == [(0, 5 * CHUNK)]


def test_stream_ensure_cached(spark, tmp_path, remote_with_block):
    """A request stream fills the cache; a second identical stream
    fetches zero remote bytes (cross-batch coalescing via the mask)."""
    remote, data, counter = remote_with_block
    root = str(tmp_path / "cache")
    reqs_dir = str(tmp_path / "requests")
    reqs = spark.createDataFrame(
        [("blk1", 0, 2500), ("blk1", 2000, 4000), ("blk1", 6000, 6500)],
        "bid string, qstart long, qend long",
    )
    reqs.repartition(2).write.parquet(reqs_dir)

    q = sparse.stream_ensure_cached(
        spark, reqs_dir, root, _factory(remote, counter), chunk_size=CHUNK
    )
    q.awaitTermination(120)
    q.stop()
    fz = sparse.SparseFreezer(root)
    assert fz.read("blk1", 0, 4000) == data[:4000]
    assert fz.read("blk1", 6000, 500) == data[6000:6500]
    before = _counted(counter)

    # second stream over a copy of the same requests
    reqs.write.parquet(str(tmp_path / "requests2"), mode="overwrite")
    q2 = sparse.stream_ensure_cached(
        spark, str(tmp_path / "requests2"), root, _factory(remote, counter),
        chunk_size=CHUNK,
    )
    q2.awaitTermination(120)
    q2.stop()
    assert _counted(counter) == before  # zero remote bytes re-fetched


def test_transfer_telemetry_lands(spark, tmp_path, remote_with_block):
    """Every fetch task logs (bid, ts, offset, bytes, latency) events;
    the monitoring queries (T5/T6/A2 shapes) read them directly
    (reference: per-transfer instrumentation, core/freezer.go:241-288)."""
    from pufs_spark.streaming import monitor

    remote, data, counter = remote_with_block
    root = str(tmp_path / "cache")
    reqs = spark.createDataFrame(
        [("blk1", 0, 3 * CHUNK), ("blk1", 5 * CHUNK, 7 * CHUNK)],
        "bid string, qstart long, qend long",
    )
    stats = sparse.ensure_cached(
        spark, root, _factory(remote, counter), reqs, chunk_size=CHUNK
    )
    ev = sparse.transfer_events(spark, root)
    rows = ev.collect()
    assert len(rows) == stats["chunks_fetched"] > 0
    assert sum(r["bytes"] for r in rows) == stats["bytes_fetched"]
    assert all(r["latency_ms"] >= 0 for r in rows)
    assert all(r["end"] - r["offset"] == CHUNK for r in rows)

    # T6 consumes the log: one rate row for the block
    rates = monitor.transfer_rates(ev).collect()
    assert len(rates) == 1 and rates[0]["bid"] == "blk1"
    # A2 shape consumes the log too
    pct = monitor.latency_percentiles(ev, value_col="latency_ms", by="bid")
    assert pct.collect()[0]["n"] == len(rows)

    # warm re-run: no new telemetry (nothing fetched)
    sparse.ensure_cached(
        spark, root, _factory(remote, counter), reqs, chunk_size=CHUNK
    )
    assert sparse.transfer_events(spark, root).count() == len(rows)
