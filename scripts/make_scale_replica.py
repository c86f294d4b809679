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

``--dup-profile`` replaces the suffix-tag document treatment with a
REALISTIC duplication profile. The suffix tag makes documents distinct but
keeps every original's N copies colliding in the same LSH bands (nearly all
3-token shingles shared), which quadratically inflates candidate-pair
queries (``dedup_edit_distance``, ``text_fingerprint_overlap``) — a
synthesis artifact, not engine scaling. Under the profile (mirroring real
corpora, where a few percent of documents have a handful of near-copies):

* 2% of originals (``doc_id % 50 == 7``) get 1–3 NEAR-copies (replicas
  ``1 .. 1 + doc_id % 3``): a single token substituted at a per-(doc,
  replica) position — ~97% of shingles still shared, so LSH/fingerprints
  correctly surface them, in linear numbers;
* every other replica copy is FAR: every token is suffixed with a 2-char
  per-replica code, so it shares NO 3-token shingle with its original,
  its siblings, or any other replica — zero spurious band collisions.

The same profile applies to ``embeddings`` (r7): the same 2% of vec_ids
get near copies (one nudged component, cos ~0.999); every other copy is
decorrelated by a per-(vec_id, replica) ±1 sign mask — see
``_dup_emb_expr`` for why the default circular shift is not enough.

Deterministic: positions and copy counts derive from ``doc_id`` arithmetic,
no RNG anywhere. Runs on DuckDB (no Spark session), so it can build data
while a bench run owns the Spark machine.

Usage:
    python scripts/make_scale_replica.py                 # /tmp/sf1, 10x sf0.1
    python scripts/make_scale_replica.py --out /tmp/sf10 --replicas 100
    python scripts/make_scale_replica.py --out /tmp/sf10dup --replicas 100 \\
        --dup-profile                                    # controlled dups
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


DUP_RATE_DEN = 50  # 1-in-50 originals (2%) get near-copies
DUP_PICK = 7  # which residue class is duplicated
MAX_COPIES = 3  # 1..3 near-copies per duplicated original


def _dup_text_expr(i: int) -> str:
    """Per-replica document text under the controlled duplication profile."""
    code = chr(97 + i // 26) + chr(97 + i % 26)  # unique 2-char replica tag
    toks = "string_split(text, ' ')"
    n = f"len({toks})"
    # near-copy: substitute ONE token at a per-(doc, replica) position
    pos = f"(1 + (doc_id + {i}) % greatest({n} - 1, 1))"
    near = (
        f"array_to_string({toks}[1:{pos} - 1] || ['q{code}x'] "
        f"|| {toks}[{pos} + 1:{n}], ' ')"
    )
    # far copy: every token tagged -> no 3-token shingle survives
    far = f"array_to_string(list_transform({toks}, t -> t || '~{code}'), ' ')"
    is_near = (
        f"doc_id % {DUP_RATE_DEN} = {DUP_PICK} "
        f"AND {i} <= 1 + doc_id % {MAX_COPIES}"
    )
    return f"CASE WHEN {is_near} THEN {near} ELSE {far} END"


def _dup_emb_expr(i: int) -> str:
    """Per-replica embedding under the controlled duplication profile.

    Mirrors the document treatment: the SAME 2% of originals
    (``vec_id % 50 == 7``, replicas ``1 .. 1 + vec_id % 3``) get NEAR
    copies — one component nudged, cos vs the original ~0.999, so the
    sign-LSH correctly surfaces them in linear numbers. Every other copy is
    FAR: a deterministic per-(vec_id, replica) ±1 sign mask multiplies the
    vector component-wise (norm-preserving), which decorrelates it from
    every hyperplane projection — unlike the default circular shift, which
    the r7 sf10 probe showed PRESERVES bucket membership for the corpus's
    clustered vectors (top 14-bit bucket: 5,543 vectors = the sf0.1 clumps
    x100 replicas; candidate volume quadratic in clump size — a synthesis
    artifact, the embedding analog of the text suffix-tag artifact)."""
    # DuckDB's 64-bit hash() as the mixer: the replica builder only needs
    # BUILD-time determinism (the parquet it writes is the contract), not a
    # cross-engine expression — and a truncated-LCG bit here is a trap: bit
    # 16 of an LCG depends only on the argument mod 2^17, so any replica
    # stride that is a multiple of 2^17 gives every replica the SAME mask
    # (measured: 100-copy mega-families, median 14-bit bucket size 99).
    mask = (
        f"(CASE WHEN hash(j * 1000003 + vec_id * 64 + {i}) % 2 = 1 "
        f"THEN 1.0 ELSE -1.0 END)"
    )
    far = (
        f"list_transform(generate_series(1, 64), "
        f"j -> CAST(embedding[j] * {mask} AS FLOAT))"
    )
    near = (
        f"list_transform(generate_series(1, 64), "
        f"j -> CASE WHEN j = 1 + (vec_id + {i}) % 64 "
        f"THEN CAST(embedding[j] * 1.05 + 0.01 AS FLOAT) "
        f"ELSE embedding[j] END)"
    )
    is_near = f"vec_id % {DUP_RATE_DEN} = {DUP_PICK} AND {i} <= 1 + vec_id % {MAX_COPIES}"
    return f"CASE WHEN {is_near} THEN {near} ELSE {far} END"


def replica_select(
    table: str, cols: list[tuple[str, str]], i: int, dup_profile: bool = False
) -> str:
    keyed = set(KEYED[table])
    parts = []
    for name, _typ in cols:
        if name in keyed:
            parts.append(f"{name} + {i * KEY_STRIDE} AS {name}")
        elif table == "documents" and name == "text" and i > 0:
            expr = _dup_text_expr(i) if dup_profile else f"text || ' xr{i}tag'"
            parts.append(f"{expr} AS text")
        elif table == "documents" and name == "n_chars" and i > 0:
            expr = (
                f"length({_dup_text_expr(i)})"
                if dup_profile
                else f"n_chars + {len(f' xr{i}tag')}"
            )
            parts.append(f"{expr} AS n_chars")
        elif table == "embeddings" and name == "embedding" and i > 0:
            if dup_profile:
                parts.append(f"{_dup_emb_expr(i)} AS embedding")
            else:
                # circular shift by i: deterministic, norm-preserving,
                # distinct — but NOT bucket-decorrelated for clustered
                # vectors (see _dup_emb_expr)
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
    ap.add_argument(
        "--dup-profile",
        action="store_true",
        help="controlled near-dup rate for documents (see module docstring)",
    )
    ap.add_argument(
        "--tables",
        nargs="*",
        default=None,
        help="rebuild only these tables (default: all)",
    )
    args = ap.parse_args()
    if args.replicas > 26 * 26:
        ap.error("--replicas exceeds the 2-char replica-tag space (676)")

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    dims = [t for t in DIMS if args.tables is None or t in args.tables]
    keyed = [t for t in KEYED if args.tables is None or t in args.tables]
    for t in dims:
        con.execute(
            f"COPY (SELECT * FROM '{args.src}/{t}.parquet') "
            f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied unchanged")
    for t in keyed:
        cols = [
            (r[0], r[1])
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{args.src}/{t}.parquet'"
            ).fetchall()
        ]
        selects = " UNION ALL ".join(
            f"SELECT {replica_select(t, cols, i, args.dup_profile)} "
            f"FROM '{args.src}/{t}.parquet'"
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
