#!/usr/bin/env python
"""Full-registry oracle sweep at an arbitrary scale directory.

Runs every registered query on Spark AND its DuckDB oracle over the same
parquet tables, compares with the external driver's normalization (sorted
column names, row multiset, floats rounded to 9 dp), and prints one line per
query plus a summary. This is the committed form of the round-5/6 ad-hoc
sweeps that caught the HALF_UP/HALF_EVEN, -0.0, and summation-order-ulp
determinism classes — each 10x scale step is the cheapest place to catch
the next class before a driver gate does (PERF.md "sf1 oracle sweep").

Usage:
    python scripts/make_scale_replica.py            # build /tmp/sf1 first
    python scripts/oracle_sweep.py --sf-dir /tmp/sf1
    python scripts/oracle_sweep.py --sf-dir /root/testdata/sf0.01 --only agg_moments
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bigtwine_streamprocessor_spark import registry
from bigtwine_streamprocessor_spark.session import get_spark

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def compare(spark_df, con, sql) -> tuple[bool, str, float, float]:
    t0 = time.perf_counter()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    t_spark = time.perf_counter() - t0
    t0 = time.perf_counter()
    cur = con.execute(sql)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    t_ddb = time.perf_counter() - t0
    if sorted(s_cols) != sorted(o_cols):
        return False, f"cols {sorted(s_cols)} != {sorted(o_cols)}", t_spark, t_ddb
    if len(s_rows) != len(o_rows):
        return (
            False,
            f"rows spark={len(s_rows)} oracle={len(o_rows)}",
            t_spark,
            t_ddb,
        )
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    o_idx = [o_cols.index(c) for c in sorted(o_cols)]
    s_set = sorted((tuple(_norm(r[i]) for i in s_idx) for r in s_rows), key=repr)
    o_set = sorted((tuple(_norm(r[i]) for i in o_idx) for r in o_rows), key=repr)
    for a, b in zip(s_set, o_set):
        if a != b:
            return False, f"value:\n  spark ={a}\n  oracle={b}", t_spark, t_ddb
    return True, f"{len(s_rows)} rows", t_spark, t_ddb


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    spark = get_spark(app_name="oracle-sweep")
    names = args.only or [n for n in registry.QUERIES if n in registry.ORACLES]
    ok = bad = 0
    failures: list[str] = []
    for name in names:
        try:
            df = registry.QUERIES[name](spark, args.sf_dir)
            match, msg, ts, td = compare(df, con, registry.ORACLES[name])
        except Exception as exc:  # a crash is a failure, keep sweeping
            match, msg, ts, td = False, f"{type(exc).__name__}: {exc}"[:300], 0, 0
        status = "MATCH" if match else "FAIL "
        print(f"{status} {name:40s} spark={ts:7.2f}s duckdb={td:7.2f}s  {msg}",
              flush=True)
        ok += match
        bad += not match
        if not match:
            failures.append(name)
    print(f"\n{ok}/{ok + bad} match at {args.sf_dir}"
          + (f"; FAILURES: {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
