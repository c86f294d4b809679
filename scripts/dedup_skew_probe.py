#!/usr/bin/env python
"""r15 dedup-index build skew probe (r14 verdict task 8).

Question: is the MinHash aggregation's straggler tail SKEW (a hot
key/oversized partition) or tail-of-uniform (the last tasks of an even
distribution)? Method: run the signature chain on an amplified corpus
(~sf1 row count) with the Spark UI's REST API enabled, then pull the
per-task duration distribution of every stage of the job and report
max/median per stage (guide §2.5: a max/median ratio above ~5-10x is
skew worth fixing; below that, salting buys nothing).

Usage:
    python scripts/dedup_skew_probe.py [--amplify 10] [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigtwine_streamprocessor_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--amplify", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark(
        app_name="dedup-skew-probe",
        extra_conf={"spark.ui.enabled": "true"},
    )
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from bigtwine_streamprocessor_spark.operators import dedup

    root = tempfile.mkdtemp(prefix="dedup-skew-")
    try:
        docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        rep = F.explode(F.array(*[F.lit(i) for i in range(args.amplify)]))
        big = (
            docs.withColumn("_rep", rep)
            .select(
                (F.col("doc_id") * args.amplify + F.col("_rep")).alias(
                    "doc_id"
                ),
                "text",
            )
        )
        big_path = os.path.join(root, "docs")
        big.write.parquet(big_path)
        big2 = spark.read.parquet(big_path)
        n = big2.count()

        spark.sparkContext.setJobDescription("skew-probe: minhash sigs")
        t0 = time.perf_counter()
        dedup.minhash_signatures(big2).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = round(time.perf_counter() - t0, 3)

        app_id = spark.sparkContext.applicationId
        ui = spark.sparkContext.uiWebUrl
        stages = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
            )
        )
        rows = []
        for st in stages:
            sid, att = st["stageId"], st["attemptId"]
            try:
                summ = json.load(
                    urllib.request.urlopen(
                        f"{ui}/api/v1/applications/{app_id}/stages/"
                        f"{sid}/{att}/taskSummary"
                        "?quantiles=0.0,0.5,0.95,1.0"
                    )
                )
            except Exception:
                continue
            dur = summ.get("duration") or summ.get("executorRunTime")
            if not dur:
                continue
            rows.append(
                {
                    "stage": sid,
                    "name": st.get("name", "")[:60],
                    "tasks": st.get("numCompleteTasks"),
                    "dur_min_ms": dur[0],
                    "dur_med_ms": dur[1],
                    "dur_p95_ms": dur[2],
                    "dur_max_ms": dur[3],
                    "max_over_med": round(dur[3] / dur[1], 2)
                    if dur[1]
                    else None,
                    "shuffle_read_mb": round(
                        (st.get("shuffleReadBytes") or 0) / 1e6, 1
                    ),
                    "stage_wall_estimate_s": round(
                        (st.get("executorRunTime") or 0) / 1000.0, 1
                    ),
                }
            )
        rows.sort(key=lambda r: -(r["dur_max_ms"] or 0))
        print(
            json.dumps(
                {
                    "metric": "dedup_build_skew_probe",
                    "docs": n,
                    "amplify": args.amplify,
                    "sigs_noop_wall_s": wall,
                    "stages": rows[:8],
                },
                indent=2,
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
