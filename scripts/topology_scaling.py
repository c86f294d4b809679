#!/usr/bin/env python
"""Streaming-topology throughput scaling curve: rate vs trigger size.

The batch sweeps prove 10x-1000x scale for every batch operator, but the
stateful streaming path (6-hop async topology + 4-way fan-in) can't be
scale-swept that way — its 100x evidence is THIS curve: hold the corpus
and file layout fixed, raise rows-per-trigger (maxFilesPerTrigger 8 ->
16 -> 32), and measure the steady-slope rate. If throughput rises with
batch size, the pipeline is trigger-latency-bound (bigger batches = more
parallel work per fixed per-trigger overhead — exactly what a real
cluster-scale feed looks like); if it flattens, the bottleneck is
per-row work and the knob is shuffle partitions instead (the 4th point
doubles them at the largest trigger to separate the two).

Run on an IDLE machine (loaded-machine streaming timings lie — PERF.md r6).

Usage:
    python scripts/topology_scaling.py [--points 8 16 32] [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_topology  # noqa: E402
from bigtwine_streamprocessor_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--points", type=int, nargs="*", default=[8, 16, 32])
    ap.add_argument(
        "--double-shuffle-at-max",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="add a 4th point: largest trigger with 2x shuffle partitions "
        "(disable with --no-double-shuffle-at-max)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="topology-scaling")
    base_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    curve = []
    runs = [(p, None) for p in args.points]
    if args.double_shuffle_at_max:
        runs.append((max(args.points), base_shuffle * 2))
    for trigger, shuffle in runs:
        r = bench_topology(
            spark,
            args.sf_dir,
            timeout_s=420,
            max_files_per_trigger=trigger,
            shuffle_partitions=shuffle,
        )
        point = {
            "max_files_per_trigger": trigger,
            "shuffle_partitions": shuffle or base_shuffle,
            "rows_per_trigger": r.get("rows_per_trigger"),
            "steady_tweets_per_s": r.get("steady_tweets_per_s"),
            "steady_window_s": r.get("steady_window_s"),
            "steady_consistency": r.get("steady_consistency"),
            "one_shot_s": r.get("elapsed_s"),
            "completed": r.get("completed"),
            "tweets": r.get("tweets"),
            "load1": round(os.getloadavg()[0], 2),
        }
        curve.append(point)
        print(json.dumps(point), flush=True)
        # restore the baseline for the next point
        spark.conf.set("spark.sql.shuffle.partitions", str(base_shuffle))

    base = curve[0]["steady_tweets_per_s"] or 1.0
    print(
        json.dumps(
            {
                "metric": "topology_rate_vs_trigger",
                "curve": [
                    {
                        "trigger": c["max_files_per_trigger"],
                        "shuffle": c["shuffle_partitions"],
                        "rate": c["steady_tweets_per_s"],
                        "vs_base": round((c["steady_tweets_per_s"] or 0) / base, 2),
                    }
                    for c in curve
                ],
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
