"""Ingest-time dedup signature index builder + per-batch scan CLI.

The dedup counterpart of ``build_ann_index_job``: materialize the corpus's
digest/MinHash/band-bucket state ONCE, then run each arriving batch as an
O(delta) scan + append instead of ``incremental_dedup``'s per-batch
re-computation over the whole corpus (see ``operators/dedup_index.py`` for
the layout and cost model).

    # ingest: build the index from the current corpus
    python -m bigtwine_streamprocessor_spark.jobs.build_dedup_index_job \
        --documents-path /root/testdata/sf0.01/documents.parquet \
        --output-path /tmp/dedup_index

    # each batch: scan the delta against the index, then append it
    ... --op scan   --documents-path <delta.parquet> --output-path <index>
    ... --op append --documents-path <delta.parquet> --output-path <index>
    # maintenance: occupancy health read / small-file re-layout
    ... --op stats   --output-path <index>
    ... --op compact --output-path <index>
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F

from ..operators import dedup_index
from ..session import get_spark


def run(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(prog="build-dedup-index-job")
    p.add_argument(
        "--documents-path",
        default=None,
        help="corpus (build) or delta (append/scan); unused by compact/stats",
    )
    p.add_argument("--output-path", required=True)
    p.add_argument(
        "--op",
        choices=["build", "append", "scan", "compact", "stats"],
        default="build",
        help="build a fresh index, append a delta's signatures, scan a "
        "delta for duplicates of the indexed corpus, compact the layout, "
        "or report band-bucket occupancy stats",
    )
    p.add_argument(
        "--threshold",
        type=float,
        default=dedup_index.NEAR_EST_THRESHOLD,
        help="scan: minimum MinHash-estimated Jaccard to flag a near dup",
    )
    p.add_argument(
        "--scan-output",
        default=None,
        help="scan: optional parquet path for the full match frame "
        "(default: only the summary counts are printed)",
    )
    p.add_argument(
        "--n-files",
        type=int,
        default=None,
        help="output file count per table (default: session shuffle "
        "partitions)",
    )
    args = p.parse_args(argv)

    spark = get_spark(app_name="build-dedup-index")

    if args.op in ("build", "append", "scan") and args.documents_path is None:
        p.error(f"--documents-path is required for --op {args.op}")

    if args.op == "build":
        docs = spark.read.parquet(args.documents_path)
        dedup_index.build_dedup_index(
            docs, args.output_path, n_files=args.n_files
        )
        stats = dedup_index.dedup_index_stats(spark, args.output_path)
        report = {"op": "build", "n_docs": stats["n_docs"],
                  "n_buckets": stats["n_buckets"]}
    elif args.op == "append":
        delta = spark.read.parquet(args.documents_path)
        dedup_index.append_dedup_index(delta, args.output_path)
        report = {"op": "append", "appended": delta.count()}
    elif args.op == "scan":
        delta = spark.read.parquet(args.documents_path)
        matches = dedup_index.scan_delta(
            delta, args.output_path, threshold=args.threshold
        )
        if args.scan_output:
            matches.write.mode("overwrite").parquet(args.scan_output)
            matches = spark.read.parquet(args.scan_output)
        by_kind = {
            r["dup_kind"]: r["n"]
            for r in matches.groupBy("dup_kind")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        report = {
            "op": "scan",
            "delta_docs": delta.count(),
            "exact": by_kind.get("exact", 0),
            "near": by_kind.get("near", 0),
        }
    elif args.op == "compact":
        report = {
            "op": "compact",
            **dedup_index.compact_dedup_index(
                spark, args.output_path, n_files=args.n_files
            ),
        }
    else:  # stats
        report = {
            "op": "stats",
            **dedup_index.dedup_index_stats(spark, args.output_path),
        }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    run()
