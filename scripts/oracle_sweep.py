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
    if callable(sql):  # scale-oracle: returns (cols, rows) directly
        o_cols, o_rows = sql(con)
    else:
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


# --- scale oracles ---------------------------------------------------------
#
# The registered driver oracles for the two embedding-cluster queries are
# single-statement RECURSIVE transitive closures whose working table is
# O(sum of component_size^2): fine at the driver's sf0.01 gate (sparse, tiny
# components), intractable at sf1+ where the cos>=0.2 candidate graph has
# ~2M edges and giant components (measured: DuckDB ground >30 min without
# finishing; the pair list alone computes in ~4 min). The sweep substitutes
# an ALGORITHMICALLY INDEPENDENT oracle at every SF: DuckDB computes the
# (non-recursive) pair list, Python union-find computes min-label components
# — a different algorithm agreeing on the same contract is a strictly
# stronger check than re-running the same recursion. Lines using these are
# tagged [alt-oracle union-find] in the output.

_PAIR_CACHE: dict[str, list] = {}


def _neardup_components(con) -> dict[int, int]:
    """Min-label connected components of the cos>=0.2 neardup pair graph."""
    from bigtwine_streamprocessor_spark.operators import similarity

    sql = (
        f"WITH {similarity.neardup_ctes_sql(0.2, n_bits=8).strip()} "
        "SELECT doc_a, doc_b FROM neardup_pairs"
    )
    if sql not in _PAIR_CACHE:
        _PAIR_CACHE.clear()  # at most one pair list held at a time
        _PAIR_CACHE[sql] = con.execute(sql).fetchall()
    pairs = _PAIR_CACHE[sql]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:  # union by min id -> every root IS its component min
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {x: find(x) for x in parent}


def _clusters_scale_oracle(con):
    comp = _neardup_components(con)
    return ["doc_id", "cluster_id"], sorted(comp.items())


def _semantic_keep_scale_oracle(con):
    comp = _neardup_components(con)
    vec_ids = [r[0] for r in con.execute("SELECT vec_id FROM embeddings").fetchall()]
    return ["vec_id"], [
        (v,) for v in vec_ids if comp.get(v, v) == v
    ]


SCALE_ORACLES = {
    "dedup_embedding_clusters": _clusters_scale_oracle,
    "dedup_semantic_keep": _semantic_keep_scale_oracle,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--skip", nargs="*", default=[])
    ap.add_argument(
        "--registered-oracles",
        action="store_true",
        help="use the registered recursive SQL even where a scale oracle exists",
    )
    args = ap.parse_args()

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    spark = get_spark(app_name="oracle-sweep")
    names = args.only or [n for n in registry.QUERIES if n in registry.ORACLES]
    names = [n for n in names if n not in set(args.skip)]
    ok = bad = 0
    failures: list[str] = []
    for name in names:
        alt = not args.registered_oracles and name in SCALE_ORACLES
        oracle = SCALE_ORACLES[name] if alt else registry.ORACLES[name]
        try:
            df = registry.QUERIES[name](spark, args.sf_dir)
            match, msg, ts, td = compare(df, con, oracle)
        except Exception as exc:  # a crash is a failure, keep sweeping
            match, msg, ts, td = False, f"{type(exc).__name__}: {exc}"[:300], 0, 0
        status = "MATCH" if match else "FAIL "
        tag = " [alt-oracle union-find]" if alt else ""
        print(f"{status} {name:40s} spark={ts:7.2f}s duckdb={td:7.2f}s  {msg}{tag}",
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
