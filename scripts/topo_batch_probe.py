#!/usr/bin/env python
"""r15 per-query micro-batch duration breakdown for the async topology.

One x80 bench-config drive; afterwards, every query's ``recentProgress``
is aggregated into per-query batch counts and duration components
(addBatch = the actual work, the rest is engine overhead: offset
resolution, planning, WAL/commit log writes). This answers WHERE each
trigger's time goes (guide §1: measure before touching anything) — the
r15 trigger-interval sweep already proved the interval itself is not the
pacer (batches overrun 1 s).

Usage: python scripts/topo_batch_probe.py [--amplify 80] [--trigger-files 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigtwine_streamprocessor_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--amplify", type=int, default=80)
    ap.add_argument("--n-files", type=int, default=256)
    ap.add_argument("--trigger-files", type=int, default=8)
    ap.add_argument("--timeout-s", type=int, default=300)
    args = ap.parse_args()

    spark = get_spark(app_name="topo-batch-probe")
    import pyspark.sql.functions as F

    from bigtwine_streamprocessor_spark import corpus
    from bigtwine_streamprocessor_spark.operators.parse import parse_tweets
    from bigtwine_streamprocessor_spark.streaming import topology
    from bigtwine_streamprocessor_spark.streaming.transport import TopicCounter

    root = tempfile.mkdtemp(prefix="topo-batch-probe-")
    try:
        base = parse_tweets(
            corpus.tweets_df(spark, args.sf_dir), skip_retweets=True
        )
        rep = F.explode(F.array(*[F.lit(i) for i in range(args.amplify)]))
        parsed = (
            base.withColumn("_rep", rep)
            .withColumn(
                "id",
                F.when(F.col("_rep") == 0, F.col("id")).otherwise(
                    F.concat(F.col("id"), F.lit("_r"), F.col("_rep"))
                ),
            )
            .drop("_rep")
            .cache()
        )
        n = parsed.count()
        indir = os.path.join(root, "in")
        parsed.repartition(args.n_files).write.json(indir)
        stream = (
            spark.readStream.schema(parsed.schema)
            .option("maxFilesPerTrigger", args.trigger_files)
            .json(indir)
        )
        t0 = time.perf_counter()
        queries, sims, topics = topology.start_topology(
            spark, os.path.join(root, "topics"), stream, "probe",
            timeout_ms=120_000,
        )
        counter = TopicCounter(topics["results"])
        got = 0
        deadline = time.time() + args.timeout_s
        while time.time() < deadline and got < n:
            got = counter.count()
            time.sleep(0.25)
        elapsed = round(time.perf_counter() - t0, 1)

        # harvest progress BEFORE stopping (stop clears nothing, but be safe)
        report = {}
        for i, q in enumerate(queries, 1):
            comps: dict[str, float] = {}
            n_batches = 0
            rows = 0
            batch_ms = []
            for p in q.recentProgress:
                if p is None:
                    continue
                n_batches += 1
                rows += p.get("numInputRows", 0) or 0
                batch_ms.append(p.get("batchDuration", 0) or 0)
                for k, v in (p.get("durationMs") or {}).items():
                    comps[k] = comps.get(k, 0.0) + v
            report[f"q{i}"] = {
                "batches": n_batches,
                "rows": rows,
                "total_batch_s": round(sum(batch_ms) / 1000.0, 1),
                "mean_batch_ms": round(sum(batch_ms) / n_batches, 0)
                if n_batches
                else None,
                "max_batch_ms": max(batch_ms) if batch_ms else None,
                "duration_components_s": {
                    k: round(v / 1000.0, 1)
                    for k, v in sorted(comps.items(), key=lambda kv: -kv[1])
                },
            }

        spark.sparkContext.setLogLevel("OFF")
        for q in queries:
            try:
                q.stop()
            except Exception:
                pass
        for s in sims:
            try:
                s.stop()
            except Exception:
                pass
        spark.sparkContext.setLogLevel("WARN")
        parsed.unpersist()
        print(
            json.dumps(
                {
                    "metric": "topo_batch_breakdown",
                    "elapsed_s": elapsed,
                    "completed": got,
                    "tweets": n,
                    "per_query": report,
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
