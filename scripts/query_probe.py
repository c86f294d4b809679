#!/usr/bin/env python
"""Per-query optimization probe: isolate, time, and plan-dump registry queries.

Bench-identical methodology (noop sink, warm page cache, min-of-2 for short
entries) but scoped to a named subset so an optimization loop can iterate in
seconds instead of re-running the whole official sweep. Optionally captures
``.explain("formatted")`` per query into a directory (the round's
``plans/rNN/<query>_{before,after}.txt`` evidence files).

Usage:
    python scripts/query_probe.py [--plans-dir plans/r14 --suffix before]
                                  [--reps 2] [--sf-dir /root/testdata/sf0.1]
                                  query1 query2 ...
    python scripts/query_probe.py --all          # every registry query
Prints one JSON line: {"queries": {name: min_s}, "calib_s": ..., "sched_load1": ...}
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigtwine_streamprocessor_spark import registry  # noqa: E402
from bigtwine_streamprocessor_spark.session import get_spark  # noqa: E402


def warm_cache(sf_dir: str) -> None:
    for fn in sorted(os.listdir(sf_dir)):
        if fn.endswith(".parquet"):
            p = os.path.join(sf_dir, fn)
            paths = (
                [os.path.join(p, f) for f in os.listdir(p)]
                if os.path.isdir(p)
                else [p]
            )
            for f in paths:
                if os.path.isfile(f):
                    with open(f, "rb") as fh:
                        while fh.read(1 << 22):
                            pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-time", action="store_true",
                    help="plan dump only, skip the timed runs")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    names = list(registry.QUERIES) if args.all else args.names
    unknown = [n for n in names if n not in registry.QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="query-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_cache(args.sf_dir)

    import bench

    calib = None if args.no_time else bench.calibration_probe(spark)

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    timings: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"probe: {name}")
        df = registry.QUERIES[name](spark, args.sf_dir)
        if args.plans_dir:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
        if args.no_time:
            continue
        best = None
        for _ in range(max(1, args.reps)):
            # rebuild the frame each rep: gate queries with scratch-index
            # side effects (dedup_incremental, similarity_ivf_topk) must pay
            # their own build each run, same as the bench and the driver
            df = registry.QUERIES[name](spark, args.sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"# {name}: {timings[name]}", file=sys.stderr, flush=True)

    out = {"queries": timings}
    if calib is not None:
        calib_end = bench.calibration_probe(spark)
        out.update(
            calib_before_s=calib["median_s"],
            calib_after_s=calib_end["median_s"],
            load1=round(os.getloadavg()[0], 2),
        )
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
