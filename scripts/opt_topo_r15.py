#!/usr/bin/env python
"""r15 topology experiment: per-hop trigger interval vs end-to-end rate.

The x80 bench feed (256 files, maxFilesPerTrigger=8) admits 32 Q1 batches;
with every hop on a 1 s processing-time trigger, admission alone floors the
drive at ~32 s and each result pays ~5 trigger waits across the 6-hop chain
(guide §1.2: per-trigger FIXED cost — here literally the trigger INTERVAL —
paces the feed, not per-row work). This sweep holds the bench feed config
fixed and varies only the hop trigger interval (and optionally the service
simulators' poll interval), interleaving the points so host drift cancels.

Usage:
    python scripts/opt_topo_r15.py [--reps 2] [--triggers 1.0 0.25 0.1]
                                   [--poll-s 0.2] [--amplify 80]
Prints one JSON line per drive and a summary block.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from bigtwine_streamprocessor_spark.session import get_spark  # noqa: E402
from bigtwine_streamprocessor_spark.streaming import topology  # noqa: E402
from bigtwine_streamprocessor_spark.streaming import transport  # noqa: E402

_ORIG_START = topology.start_topology


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--triggers", type=float, nargs="*", default=[1.0, 0.25, 0.1]
    )
    ap.add_argument("--poll-s", type=float, default=None,
                    help="override ServiceSimulator poll interval")
    ap.add_argument("--amplify", type=int, default=80)
    ap.add_argument("--n-files", type=int, default=256)
    ap.add_argument("--trigger-files", type=int, default=8,
                    help="maxFilesPerTrigger (bench latency mode = 8)")
    args = ap.parse_args()

    if args.poll_s is not None:
        transport.ServiceSimulator.__init__.__defaults__ = (
            args.poll_s,
            None,
        )

    spark = get_spark(app_name="opt-topo-r15")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    results: list[dict] = []
    for rep in range(args.reps):
        # alternate sweep direction per rep so slow host drift cancels
        order = args.triggers if rep % 2 == 0 else list(reversed(args.triggers))
        for trig in order:
            def patched(s, root, parsed, aid, timeout_ms=15_000,
                        trigger_s=1, topics=None, _t=trig):
                return _ORIG_START(s, root, parsed, aid,
                                   timeout_ms=timeout_ms, trigger_s=_t,
                                   topics=topics)

            topology.start_topology = patched
            t0 = time.time()
            r = bench.bench_topology(
                spark,
                args.sf_dir,
                max_files_per_trigger=args.trigger_files,
                amplify=args.amplify,
                n_files=args.n_files,
            )
            topology.start_topology = _ORIG_START
            point = {
                "rep": rep,
                "trigger_s": trig,
                "poll_s": args.poll_s,
                "elapsed_s": r["elapsed_s"],
                "tweets_per_s": r["tweets_per_s"],
                "steady_tweets_per_s": r["steady_tweets_per_s"],
                "steady_consistency": r["steady_consistency"],
                "completed": r["completed"],
                "tweets": r["tweets"],
                "load1": round(os.getloadavg()[0], 2),
                "wall_s": round(time.time() - t0, 1),
            }
            results.append(point)
            print(json.dumps(point), flush=True)

    summary: dict[float, dict] = {}
    for trig in args.triggers:
        pts = [p for p in results if p["trigger_s"] == trig]
        summary[trig] = {
            "min_elapsed_s": min(p["elapsed_s"] for p in pts),
            "median_elapsed_s": sorted(p["elapsed_s"] for p in pts)[
                len(pts) // 2
            ],
            "max_steady": max(p["steady_tweets_per_s"] for p in pts),
            "all_complete": all(p["completed"] == p["tweets"] for p in pts),
        }
    print(json.dumps({"metric": "topo_trigger_sweep", "summary": summary}),
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
