#!/usr/bin/env python
"""Round-14 experiment batch 2: where does the dedup/LSH family's time go,
and does runtime (AQE) exchange reuse already collapse the self-join's two
chain executions? Times chain pieces and persist variants co-timed."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark.session import get_spark
from bigtwine_streamprocessor_spark.operators import dedup

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    print(f"  {label}: {best:.3f}", flush=True)
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark(app_name="opt-exp2-r14")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()

    print("== minhash/LSH chain pieces", flush=True)
    t("shingles explode only", lambda: noop(dedup._shingles(docs)))
    t("minhash_signatures", lambda: noop(dedup.minhash_signatures(docs)))
    t("signature_bands", lambda: noop(
        dedup.signature_bands(dedup.minhash_signatures(docs))))
    t("lsh_candidate_pairs (current)", lambda: noop(
        dedup.lsh_candidate_pairs(docs)))

    def lsh_persisted():
        sigs = dedup.minhash_signatures(docs).persist()
        noop(dedup.lsh_candidate_pairs(docs, sigs=sigs))
        sigs.unpersist()

    t("lsh_candidate_pairs (sigs persisted)", lsh_persisted)

    print("== ngram_jaccard", flush=True)
    t("ngram_jaccard (current)", lambda: noop(
        dedup.ngram_jaccard_pairs(docs, 0.5)))

    def ngram_persisted():
        sigs = dedup.minhash_signatures(docs).persist()
        cands = dedup.lsh_candidate_pairs(docs, sigs=sigs)
        noop(dedup.ngram_jaccard_pairs(docs, 0.5, cands=cands))
        sigs.unpersist()

    t("ngram_jaccard (sigs persisted)", ngram_persisted)

    print("== minhash_estimate", flush=True)
    t("minhash_estimate (current)", lambda: noop(
        dedup.minhash_estimate_pairs(docs)))

    def est_persisted():
        sigs = dedup.minhash_signatures(docs).persist()
        cands = dedup.lsh_candidate_pairs(docs, sigs=sigs)
        noop(dedup.minhash_estimate_pairs(docs, sigs=sigs, cands=cands))
        sigs.unpersist()

    t("minhash_estimate (sigs+cands persisted)", est_persisted)

    print("== simhash", flush=True)
    t("simhash_bands", lambda: noop(dedup.simhash_bands(docs)))
    t("simhash_pairs (current)", lambda: noop(dedup.simhash_pairs(docs)))

    spark.stop()


if __name__ == "__main__":
    main()
