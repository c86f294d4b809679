#!/usr/bin/env python
"""Occupancy-constant verification of the embedding near-dup family.

At the driver gate the family is pinned to ``n_bits=8`` (256 buckets) for
oracle parity. Bucket-local candidate generation is O(n * occupancy) with
occupancy = n / 2^bits — so holding n_bits FIXED while the corpus grows 10x
grows the candidate volume ~100x on BOTH engines (the r7 sf10 sweep
measured exactly that: the pinned-bits spark side crawled and the DuckDB
pair CTE extrapolates to hours). That is not how the operator deploys: at
scale you raise n_bits with the corpus (the operator's production default
is 16 bits; `similarity.py:N_BITS`), keeping occupancy — and therefore
per-vector work — constant.

This probe IS that scale story, made falsifiable: run the three
embedding-graph queries (pairs, clusters, semantic keep) at an occupancy
chosen for the target SF, with the SAME n_bits driving the Spark operator,
the DuckDB oracle generator, and the union-find independent oracle, and
hash-compare engine-side (no result transfer). sf0.1 @ 8 bits, sf1 @ ~11
bits and sf10 @ ~14 bits all hold occupancy ~= 12 vectors/bucket.

Usage:
    python scripts/neardup_scale_probe.py --sf-dir /tmp/sf10 --n-bits 14
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from bigtwine_streamprocessor_spark.operators import dedup, similarity
from bigtwine_streamprocessor_spark.session import get_spark
from oracle_sweep import _components, compare_hash  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf10")
    ap.add_argument("--n-bits", type=int, default=14)
    ap.add_argument("--threshold", type=float, default=0.2)
    args = ap.parse_args()

    con = duckdb.connect()
    con.execute(f"SET memory_limit = '{os.environ.get('SWEEP_DDB_MEM', '24GB')}'")
    con.execute("SET threads = 16")
    con.execute("SET temp_directory = '/tmp/duckdb_sweep_spill'")
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{args.sf_dir}/embeddings.parquet'"
    )
    n_vec = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    print(
        f"{n_vec} vectors, {2 ** args.n_bits} buckets -> occupancy "
        f"{n_vec / 2 ** args.n_bits:.1f}",
        flush=True,
    )

    spark = get_spark(app_name="neardup-scale-probe")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    t, b = args.threshold, args.n_bits

    pair_sql = (
        f"WITH {similarity.neardup_ctes_sql(t, n_bits=b).strip()} "
        "SELECT doc_a, doc_b FROM neardup_pairs"
    )

    def clusters_oracle(c):
        comp = _components(c, pair_sql)
        return ["doc_id", "cluster_id"], sorted(comp.items())

    def keep_oracle(c):
        comp = _components(c, pair_sql)
        vec_ids = [r[0] for r in c.execute("SELECT vec_id FROM embeddings").fetchall()]
        return ["vec_id"], [(v,) for v in vec_ids if comp.get(v, v) == v]

    def keep_df():
        from pyspark.sql import functions as F

        edges = similarity.embedding_neardup_pairs(emb, t, n_bits=b).select(
            "doc_a", "doc_b"
        )
        cc = dedup.connected_components(edges)
        return (
            emb.join(cc, emb["vec_id"] == cc["doc_id"], "left")
            .filter(
                F.col("cluster_id").isNull()
                | (F.col("cluster_id") == F.col("vec_id"))
            )
            .select("vec_id")
        )

    runs = [
        (
            "neardup_pairs",
            lambda: similarity.embedding_neardup_pairs(emb, t, n_bits=b),
            similarity.embedding_neardup_sql(t, n_bits=b),
        ),
        (
            "embedding_clusters",
            lambda: dedup.connected_components(
                similarity.embedding_neardup_pairs(emb, t, n_bits=b).select(
                    "doc_a", "doc_b"
                )
            ),
            clusters_oracle,
        ),
        ("semantic_keep", keep_df, keep_oracle),
    ]
    bad = 0
    for name, df_fn, oracle in runs:
        t0 = time.perf_counter()
        try:
            match, msg, ts, td = compare_hash(df_fn(), con, oracle, name)
        except Exception as exc:
            match, msg, ts, td = False, f"{type(exc).__name__}: {exc}"[:300], 0, 0
        build = time.perf_counter() - t0 - ts - td
        print(
            f"{'MATCH' if match else 'FAIL '} {name:24s} n_bits={b} "
            f"spark={ts:7.2f}s duckdb={td:7.2f}s build={build:6.2f}s  {msg}",
            flush=True,
        )
        bad += not match
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
