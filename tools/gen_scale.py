#!/usr/bin/env python
"""Tile the driver's sf0.1 testdata to a larger scale factor for
SCALING measurements (BASELINE.md's sf1.0 table): each replica shifts
every key column by a disjoint stride so FK joins stay consistent and
cardinalities scale linearly.

Content columns are decorrelated across replicas so data-dependent
operators scale linearly instead of quadratically:
- documents.text: replica i>0 rotates the 12 most frequent letters by
  i positions (translate) — near-dup shingles are CHARACTER 5-grams,
  so a word-level marker is not enough (measured: suffixing every
  word left replicas ~0.5 char-Jaccard similar, putting every doc in
  a 10-clique at the banding threshold and inflating D1 106x); the
  letter rotation kills virtually every shared 5-gram while
  preserving lengths, token boundaries, and token counts, so true
  near-dup pairs (D1), postings (T12), and quality stats (T1) scale
  linearly;
- embeddings.embedding: a deterministic value-dependent perturbation
  (x + 0.05*i*sin(37x)) rotates each replica's vectors slightly so
  high-threshold cosine neighbors stay within-replica.

This is a PERF harness, not correctness data: oracles keep running on
the driver's own sf dirs. Output goes outside the repo (default
/tmp/pufs_sf1.0) and is gitignored territory.

Usage: python tools/gen_scale.py [src_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb

STRIDE = 10_000_000  # > any key at the source scale, uniform for all keys

# table -> columns to shift by replica*STRIDE
KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]  # TPC-H dims don't scale


def replica_select(table: str, cols: list[str], i: int) -> str:
    shifts = set(KEY_SHIFTS.get(table, []))
    out = []
    for c in cols:
        if c in shifts:
            out.append(f"{c} + {i * STRIDE} AS {c}")
        elif table == "documents" and c == "text" and i > 0:
            # TWO independent 12-letter rotations (disjoint sets) give
            # 144 distinct transforms: a single rotation repeats every
            # 12 replicas, so a 100-replica (sf10) tile made every doc
            # an EXACT duplicate of ~8 others — LSH wall scales with
            # sum(cluster^2), and D1 measured 403 s at sf10 purely on
            # the generator's dup cliques (r12). Composed rotations
            # keep replicas pairwise-decorrelated to factor 144.
            s1 = "etaoinshrdlu"
            s2 = "cmfwypbgkqvx"
            r1, r2 = i % 12, (i // 12) % 12
            d1 = s1[r1:] + s1[:r1]
            d2 = s2[r2:] + s2[:r2]
            src_l = s1 + s1.upper() + s2 + s2.upper()
            dst_l = d1 + d1.upper() + d2 + d2.upper()
            out.append(
                f"translate(text, '{src_l}', '{dst_l}') AS text"
            )
        elif table == "embeddings" and c == "embedding" and i > 0:
            out.append(
                f"list_transform(embedding, x -> "
                f"CAST(x + 0.05 * {i} * sin(37.0 * x) AS FLOAT)) AS embedding"
            )
        else:
            out.append(c)
    return ", ".join(out)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pufs_sf1.0"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    tables = sorted(
        f[:-8] for f in os.listdir(src) if f.endswith(".parquet")
    )
    for t in tables:
        src_f = os.path.join(src, f"{t}.parquet")
        dst_f = os.path.join(out, f"{t}.parquet")
        if t in COPY_ONLY:
            con.sql(
                f"COPY (SELECT * FROM read_parquet('{src_f}')) TO '{dst_f}'"
                " (FORMAT PARQUET)"
            )
            print(f"{t}: copied")
            continue
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src_f}')"
            ).fetchall()
        ]
        selects = " UNION ALL ".join(
            f"SELECT {replica_select(t, cols, i)} "
            f"FROM read_parquet('{src_f}')"
            for i in range(factor)
        )
        # modest row groups so Spark gets split parallelism from the
        # single output file
        con.sql(
            f"COPY ({selects}) TO '{dst_f}' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst_f}')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
