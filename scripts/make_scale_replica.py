#!/usr/bin/env python
"""Synthesize the next 10x scale step from the driver's largest testdata.

The driver ships sf0.001/0.01/0.1; the engine's scale posture claims must
survive the NEXT order of magnitude, so this script builds /tmp/sf1 (or any
--replicas multiple) as an N-way replica of sf0.1 with the key discipline the
round-6 sweep used (PERF.md "Round-6: sf1 oracle sweep"):

* every bigint key column offsets by ``i * KEY_STRIDE`` in replica ``i`` —
  all intra-replica joins stay valid and keys never collide across replicas
  (sf0.1 max key is ~600k, stride is 10M);
* pure dims (``region``, ``nation``) copy once, unchanged — facts reference
  them by small int keys that must not shift;
* ``documents.text`` gets a per-replica suffix tag (and ``n_chars`` is
  recomputed) so the corpus is N DISTINCT documents per original — N exact
  copies would explode LSH candidate pairs quadratically in N and measure
  synthesis artifacts, not engine scaling;
* ``embeddings.embedding`` is circular-shifted by ``i`` coordinates in
  replica ``i`` — iso-norm, deterministic, and decorrelated across replicas,
  for the same reason as the text tag (identical vectors would add
  C(N,2) cos=1.0 pairs per original vector to every near-dup query).

Runs on DuckDB (no Spark session), so it can build data while a bench run
owns the Spark machine. Deterministic: no RNG anywhere.

Usage:
    python scripts/make_scale_replica.py                 # /tmp/sf1, 10x sf0.1
    python scripts/make_scale_replica.py --out /tmp/sf10 --replicas 100
"""

from __future__ import annotations

import argparse
import os

import duckdb

KEY_STRIDE = 10_000_000

# table -> bigint key columns that shift by replica stride
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def replica_select(table: str, cols: list[tuple[str, str]], i: int) -> str:
    keyed = set(KEYED[table])
    parts = []
    for name, _typ in cols:
        if name in keyed:
            parts.append(f"{name} + {i * KEY_STRIDE} AS {name}")
        elif table == "documents" and name == "text" and i > 0:
            parts.append(f"text || ' xr{i}tag' AS text")
        elif table == "documents" and name == "n_chars" and i > 0:
            parts.append(f"n_chars + {len(f' xr{i}tag')} AS n_chars")
        elif table == "embeddings" and name == "embedding" and i > 0:
            # circular shift by i: deterministic, norm-preserving, distinct
            s = i % 64
            parts.append(
                f"embedding[{s + 1}:64] || embedding[1:{s}] AS embedding"
            )
        else:
            parts.append(name)
    return ", ".join(parts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{args.src}/{t}.parquet') "
            f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied unchanged")
    for t in KEYED:
        cols = [
            (r[0], r[1])
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{args.src}/{t}.parquet'"
            ).fetchall()
        ]
        selects = " UNION ALL ".join(
            f"SELECT {replica_select(t, cols, i)} FROM '{args.src}/{t}.parquet'"
            for i in range(args.replicas)
        )
        con.execute(
            f"COPY ({selects}) TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{args.out}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows ({args.replicas}x)")


if __name__ == "__main__":
    main()
