#!/usr/bin/env python
"""Round-14 experiment batch 3: minhash_signatures alternatives.

v2 map-only: no explode/shuffle — 3 digest arrays per row (md5 evaluated
once per round per shingle, never repeated), then 12 array_min over cheap
substring transforms. The self-join sides then recompute a map-only chain
instead of reusing one exchange.
v3 long-min: same explode+agg shape as current but aggregates MIN over the
chunks parsed to BIGINT (narrower partial-agg state + shuffle), formatted
back to the identical 8-hex-char strings after the agg.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark.session import get_spark
from bigtwine_streamprocessor_spark.operators import dedup
from bigtwine_streamprocessor_spark.operators.dedup import (
    CHUNKS_PER_MD5,
    MD5_ROUNDS,
    MINHASH_K,
    SHINGLE_N,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def minhash_v2(docs: DataFrame) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - SHINGLE_N, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, SHINGLE_N), " "),
        )
    )
    def _dig(s):
        return lambda g: F.md5(F.concat(F.lit(f"{s}|"), g))

    def _chunk(c):
        return lambda h: F.substring(h, c * 8 + 1, 8)

    staged = docs.select("doc_id", grams.alias("_g")).select(
        "doc_id",
        *[
            F.transform(F.col("_g"), _dig(s)).alias(f"_d{s}")
            for s in range(MD5_ROUNDS)
        ],
    )
    mins = [
        F.array_min(
            F.transform(
                F.col(f"_d{p // CHUNKS_PER_MD5}"), _chunk(p % CHUNKS_PER_MD5)
            )
        ).alias(f"_s{p}")
        for p in range(MINHASH_K)
    ]
    return staged.select("doc_id", *mins).select(
        "doc_id", F.array(*[f"_s{p}" for p in range(MINHASH_K)]).alias("sig")
    )


def minhash_v3(docs: DataFrame) -> DataFrame:
    sh = dedup._shingles(docs)
    digests = sh.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle"))).alias(f"_m{s}")
            for s in range(MD5_ROUNDS)
        ],
    )
    chunks = digests.select(
        "doc_id",
        *[
            F.conv(F.substring(f"_m{s}", c * 8 + 1, 8), 16, 10)
            .cast("long")
            .alias(f"_h{s * CHUNKS_PER_MD5 + c}")
            for s in range(MD5_ROUNDS)
            for c in range(CHUNKS_PER_MD5)
        ],
    )
    mins = chunks.groupBy("doc_id").agg(
        *[F.min(f"_h{p}").alias(f"_s{p}") for p in range(MINHASH_K)]
    )
    return mins.select(
        "doc_id",
        F.array(
            *[
                F.lower(F.lpad(F.hex(F.col(f"_s{p}")), 8, "0"))
                for p in range(MINHASH_K)
            ]
        ).alias("sig"),
    )


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
    spark = get_spark(app_name="opt-exp3-r14")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()

    cur = {r["doc_id"]: r["sig"] for r in dedup.minhash_signatures(docs).collect()}
    for name, fn in [("v2", minhash_v2), ("v3", minhash_v3)]:
        got = {r["doc_id"]: r["sig"] for r in fn(docs).collect()}
        eq = got == cur
        print(f"== minhash {name}: equality {'OK' if eq else 'MISMATCH'}")
        if not eq:
            k = next(k for k in cur if cur[k] != got.get(k))
            print("   first diff doc", k, cur[k], "vs", got.get(k))
            return

    t("sigs current", lambda: noop(dedup.minhash_signatures(docs)))
    t("sigs v2 map-only", lambda: noop(minhash_v2(docs)))
    t("sigs v3 long-min", lambda: noop(minhash_v3(docs)))
    t("lsh_pairs current", lambda: noop(dedup.lsh_candidate_pairs(docs)))
    t("lsh_pairs over v2", lambda: noop(
        dedup.lsh_candidate_pairs(docs, sigs=minhash_v2(docs))))
    t("lsh_pairs over v3", lambda: noop(
        dedup.lsh_candidate_pairs(docs, sigs=minhash_v3(docs))))
    spark.stop()


if __name__ == "__main__":
    main()
