#!/usr/bin/env python
"""Measure the MinHash signature reuse seams (r10 verdict task 4).

Two compositions of the three signature consumers (LSH candidate pairs,
exact n-gram Jaccard on candidates, MinHash-vs-exact calibration):

* ``default``  — each consumer recomputes the shingle-explode + MinHash
  chain from the documents table (the gate shape: cheapest single-query
  plan on local[32], where Spark runs the redundant chain executions in
  parallel).
* ``persisted``— the 100 TB caller shape: ``minhash_signatures`` is
  persisted ONCE, ``lsh_candidate_pairs(sigs=...)`` is persisted once, and
  every consumer probes those frames through the ``sigs=``/``cands=``
  seams, paying the signature build a single time.

Equality of the two shapes is pinned in tests/test_dedup.py; this script
records the wall-clock claim that previously lived only in a docstring.

Usage:
    python scripts/sigs_reuse_bench.py [--sf-dir /root/testdata/sf0.1]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--threshold", type=float, default=0.5)
    args = ap.parse_args()

    from bigtwine_streamprocessor_spark.operators import dedup
    from bigtwine_streamprocessor_spark.session import get_spark

    spark = get_spark(app_name="sigs-reuse-bench")
    docs = (
        spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .persist()
    )
    n_docs = docs.count()

    def timed(fn):
        t0 = time.monotonic()
        n = fn()
        return round(time.monotonic() - t0, 3), n

    # ---- default shape: every consumer rebuilds the signature chain ------
    t_lsh_d, n_pairs = timed(lambda: dedup.lsh_candidate_pairs(docs).count())
    t_jac_d, _ = timed(
        lambda: dedup.ngram_jaccard_pairs(docs, args.threshold).count()
    )
    t_est_d, _ = timed(lambda: dedup.minhash_estimate_pairs(docs).count())

    # ---- persisted shape: build sigs/cands once, probe through the seams --
    t0 = time.monotonic()
    sigs = dedup.minhash_signatures(docs).persist()
    n_sigs = sigs.count()
    t_sigs = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    cands = dedup.lsh_candidate_pairs(docs, sigs=sigs).persist()
    cands.count()
    t_cands = round(time.monotonic() - t0, 3)
    t_jac_p, _ = timed(
        lambda: dedup.ngram_jaccard_pairs(
            docs, args.threshold, cands=cands
        ).count()
    )
    t_est_p, _ = timed(
        lambda: dedup.minhash_estimate_pairs(docs, sigs=sigs, cands=cands)
        .count()
    )

    default_total = round(t_lsh_d + t_jac_d + t_est_d, 3)
    persisted_total = round(t_sigs + t_cands + t_jac_p + t_est_p, 3)
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "n_docs": n_docs,
                "n_sigs": n_sigs,
                "n_lsh_pairs": n_pairs,
                "default": {
                    "lsh_pairs_s": t_lsh_d,
                    "ngram_jaccard_s": t_jac_d,
                    "minhash_estimate_s": t_est_d,
                    "total_s": default_total,
                },
                "persisted": {
                    "build_sigs_s": t_sigs,
                    "build_cands_s": t_cands,
                    "ngram_jaccard_s": t_jac_p,
                    "minhash_estimate_s": t_est_p,
                    "total_s": persisted_total,
                },
                "speedup_composed": round(default_total / persisted_total, 3)
                if persisted_total
                else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
