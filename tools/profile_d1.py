#!/usr/bin/env python
"""Stage-by-stage D1 profile (round-11 task 3: the sf1.0 wall is
21.5 s — 2.4x the next query). Times each phase of near_dup_pairs in
isolation at $SPARK_GRAFT_SF_DIR so the dominant constant factor is a
measured fact, not a guess."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pufs_spark.session import get_spark
from pufs_spark.tables import load_table
from pufs_spark.operators import dedup

from pyspark.sql import functions as F


def force(df):
    df.write.format("noop").mode("overwrite").save()


def t(fn):
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/pufs_sf1.0")
    spark = get_spark(app_name="profile_d1")
    docs = load_table(spark, sf_dir, "documents")
    force(docs)  # warm footers/JVM

    out = {}
    # 1. scan + shingle-hash + explode (no aggregation)
    hashed = docs.select(
        F.col("doc_id"),
        F.explode_outer(
            F.expr(
                "transform(sequence(1, length(text) - 4),"
                f" i -> pmod(xxhash64(substring(text, i, 5)), {dedup.MERSENNE31}))"
            )
        ).alias("_x"),
    )
    out["explode_only"] = t(lambda: force(hashed))
    # 2. + the 64 min-aggregates (the signature build proper)
    sigs = dedup.minhash_signatures(docs, num_hashes=64)
    out["signatures"] = t(lambda: force(sigs))
    # 3. signature build again with persist (what near_dup_pairs does)
    sigs_p = dedup.minhash_signatures(docs, num_hashes=64).persist()
    out["signatures_persist"] = t(lambda: sigs_p.count())
    # 4. banding self-join off the persisted sigs
    cand = dedup.lsh_candidate_pairs(sigs_p, bands=16, rows=4)
    out["banding_join"] = t(lambda: force(cand))
    # 5. estimate prune off persisted sigs (re-plans the banding too)
    est = dedup.estimate_jaccard_pairs(sigs_p, cand, broadcast_ok=True)
    surv = est.where(F.col("est_jaccard") >= 0.45).select("a", "b")
    out["estimate_prune"] = t(lambda: force(surv))
    # 6. exact jaccard on survivors (re-plans 4+5 too)
    exact = dedup.jaccard_pairs(docs, surv).where(F.col("jaccard") >= 0.7)
    out["exact_verify"] = t(lambda: force(exact))
    sigs_p.unpersist()
    # 7. the full operator, as benched
    out["full_near_dup_pairs"] = t(
        lambda: force(dedup.near_dup_pairs(docs, threshold=0.7, rows=4))
    )
    out["sf_dir"] = sf_dir
    print(json.dumps(out))


if __name__ == "__main__":
    main()
