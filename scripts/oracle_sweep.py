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
from datetime import datetime, timedelta, timezone

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

# keyed by (connection id, sql) so two connections / scale dirs in one
# process can't silently reuse each other's pair list; _PAIR_HIT records
# whether the last lookup was served from cache so the per-query duckdb=
# timing (which then excludes the ~4-min pair computation amortized into
# the first query) is self-identifying in the sweep output
_PAIR_CACHE: dict[tuple[int, str], list] = {}
_PAIR_HIT: bool = False


def _components(con, sql: str) -> dict[int, int]:
    """Min-label connected components of the pair graph ``sql`` yields."""
    global _PAIR_HIT
    key = (id(con), sql)
    _PAIR_HIT = key in _PAIR_CACHE
    if not _PAIR_HIT:
        _PAIR_CACHE.clear()  # at most one pair list held at a time
        _PAIR_CACHE[key] = con.execute(sql).fetchall()
    pairs = _PAIR_CACHE[key]
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


def _neardup_components(con) -> dict[int, int]:
    """Components of the cos>=0.2 embedding neardup pair graph."""
    from bigtwine_streamprocessor_spark.operators import similarity

    return _components(
        con,
        f"WITH {similarity.neardup_ctes_sql(0.2, n_bits=8).strip()} "
        "SELECT doc_a, doc_b FROM neardup_pairs",
    )


def _clusters_scale_oracle(con):
    comp = _neardup_components(con)
    return ["doc_id", "cluster_id"], sorted(comp.items())


def _semantic_keep_scale_oracle(con):
    comp = _neardup_components(con)
    vec_ids = [r[0] for r in con.execute("SELECT vec_id FROM embeddings").fetchall()]
    return ["vec_id"], [
        (v,) for v in vec_ids if comp.get(v, v) == v
    ]


def _text_clusters_scale_oracle(con):
    """dedup_clusters twin: same min-label components, over the text
    jaccard>=0.5 pair graph (the registered WITH RECURSIVE closure is
    O(component^2) and spill-exhausted the disk at sf10)."""
    from bigtwine_streamprocessor_spark.operators import dedup

    comp = _components(
        con,
        f"WITH {dedup.ngram_jaccard_sql().strip().rstrip(',')} "
        "SELECT doc_a, doc_b FROM jaccard_pairs",
    )
    return ["doc_id", "cluster_id"], sorted(comp.items())


class ChunkedOracle:
    """Exact chunk decomposition of an oracle whose SQL partitions entirely
    by one key column of one table: evaluating the UNMODIFIED statement over
    each key-residue slice (``key % n = i``) and concatenating/summing is
    value-identical to the single-shot run, at ~1/n the peak memory.

    Exists for ``events_gap_fill`` at the 640x rung: its 671M-row
    generate_series grid spilled past the 24 GB default and needed a
    hand-set ``SWEEP_DDB_MEM=90GB`` (r12 verdict task 6). Every CTE of the
    gap-fill oracle — window functions, bounds, grid, LOCF — is
    user_id-partitioned, so the residue slices never interact.

    Chunk count auto-sizes from the source parquet (one chunk per
    ``bytes_per_chunk``, clipped to [1, 64]) so small-SF sweeps pay one
    query and the 640x rung decomposes without any env knob.
    """

    # keywords that may legally follow `FROM <table>` — anything else in
    # that position is a table alias, which the naive slice rewrite below
    # would corrupt (`FROM events e` -> double alias), so the constructor
    # rejects it loudly (advisor r13)
    _POST_TABLE_KEYWORDS = frozenset(
        "WHERE GROUP ORDER LIMIT HAVING WINDOW QUALIFY UNION INTERSECT "
        "EXCEPT JOIN LEFT RIGHT INNER FULL CROSS ON USING".split()
    )

    def __init__(self, sql: str, table: str, key: str,
                 bytes_per_chunk: int = 256 * 2**20):
        import re

        # word-bounded so `FROM events` never matches `FROM events_x`
        self._from_re = re.compile(
            rf"\bFROM\s+{re.escape(table)}\b", re.IGNORECASE
        )
        matches = list(self._from_re.finditer(sql))
        if not matches:
            raise ValueError(f"oracle SQL never reads 'FROM {table}'")
        alias_re = re.compile(r"\s+(?:AS\s+)?([A-Za-z_]\w*)", re.IGNORECASE)
        for m in matches:
            nxt = alias_re.match(sql, m.end())
            if nxt and nxt.group(1).upper() not in self._POST_TABLE_KEYWORDS:
                raise ValueError(
                    f"oracle SQL aliases {table!r} as {nxt.group(1)!r} — "
                    "ChunkedOracle's slice rewrite requires unaliased "
                    f"'FROM {table}' references (rewrite adds its own alias)"
                )
        self.sql, self.table, self.key = sql, table, key
        self.bytes_per_chunk = bytes_per_chunk
        self._src_dir: str | None = None  # main() wires the swept sf_dir

    def n_chunks(self) -> int:
        path = os.path.join(self._src_dir or ".", f"{self.table}.parquet")
        try:
            size = os.path.getsize(path)
        except OSError:
            return 1
        return min(64, max(1, -(-size // self.bytes_per_chunk)))

    def chunk_sql(self, i: int, n: int) -> str:
        if n == 1:
            return self.sql
        sliced = (
            f"FROM (SELECT * FROM {self.table} "
            f"WHERE {self.key} % {n} = {i}) {self.table}"
        )
        return self._from_re.sub(sliced, self.sql)

    def __call__(self, con):  # full-compare path: concatenate chunk rows
        n = self.n_chunks()
        cols, rows = None, []
        for i in range(n):
            cur = con.execute(self.chunk_sql(i, n))
            cols = [d[0] for d in cur.description]
            rows += cur.fetchall()
        return cols, rows


def _gap_fill_chunked() -> ChunkedOracle:
    return ChunkedOracle(
        registry.ORACLES["events_gap_fill"], "events", "user_id"
    )


SCALE_ORACLES = {
    "dedup_embedding_clusters": _clusters_scale_oracle,
    "dedup_semantic_keep": _semantic_keep_scale_oracle,
    "dedup_clusters": _text_clusters_scale_oracle,
    "events_gap_fill": _gap_fill_chunked(),
}


# --- sampled-oracle mode (--sample-mod) --------------------------------------
#
# At sf10 two queries are oracle-COST-bound, not engine-bound
# (`similarity_embedding_neardup`, `dedup_minhash_estimate`): DuckDB
# evaluates the from-scratch minhash/shingle SQL near-single-threaded over
# the full 500k-doc corpus for HOURS, while Spark finishes in seconds and
# both sides MATCH at sf1 (PERF.md round-10). The sampled mode shrinks the
# ORACLE's input, not just the comparison: a deterministic slice predicate
# (doc_id/vec_id % M == 0) is applied to the corpus tables by materializing
# a sliced replica dir — sliced parquet for the keyed tables, symlinks for
# the rest — and the sweep then runs the UNMODIFIED query and oracle against
# it through their normal read paths. Both engines see the identical slice,
# signature-build cost drops ~M-fold and pair enumeration ~M^2-fold, and
# the differential check still exercises the full operator logic at a
# 10x-scale row count. Combine with --hash-compare to also skip the
# result-set transfer.

SLICE_KEYS = {"documents": "doc_id", "embeddings": "vec_id"}

# Fixed-id query windows that must SURVIVE the slice: the similarity top-k
# queries score the first N_QUERIES vec_ids, so a bare %mod slice at
# mod > n_queries keeps only vec_id 0 and the 640x check degenerates to one
# query vector (PERF.md r11 caveat, judge r11 task 3). The seeded-delta doc
# windows (corpus_prep.INC_*_MOD) need no retention: they intersect the
# %mod slice on doc_id % lcm(mod, INC_MOD) == 0 — thinned proportionally,
# never to a fixed handful. Both engines read the same replica, so retained
# off-mod rows cannot cause a mismatch.


def _slice_retain() -> dict[str, str]:
    from bigtwine_streamprocessor_spark.operators import similarity

    return {"embeddings": f"vec_id < {similarity.N_QUERIES}"}


def build_slice(con, sf_dir: str, mod: int) -> str:
    """Materialize the deterministic input slice of ``sf_dir`` in a
    per-process scratch dir (removed at exit). A fixed predictable /tmp
    name was pre-creatable/symlinkable by another user and collided across
    concurrent sweeps (advisor r11) — mkdtemp mirrors
    registry._gate_index_path's per-PID discipline."""
    import atexit
    import shutil
    import tempfile

    base = os.path.basename(os.path.normpath(sf_dir))
    out = tempfile.mkdtemp(prefix=f"sweep_slice_m{mod}_{base}_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    retain = _slice_retain()
    for t in TABLES:
        src = os.path.abspath(f"{sf_dir}/{t}.parquet")
        if not os.path.exists(src):
            continue
        dst = f"{out}/{t}.parquet"
        if t in SLICE_KEYS:
            pred = f"{SLICE_KEYS[t]} % {mod} = 0"
            if t in retain:
                pred = f"({pred}) OR ({retain[t]})"
            con.execute(
                f"COPY (SELECT * FROM '{src}' WHERE "
                f"{pred}) TO '{dst}' (FORMAT PARQUET)"
            )
        else:
            os.symlink(src, dst)
    return out


# --- engine-side hash compare (--hash-compare) ------------------------------
#
# At sf10 some result sets are themselves huge (events_gap_fill: a 10.5M-row
# time grid; dedup_paragraphs: 500k rows), so the full compare's
# collect-into-Python transfer dominates and blocks verification — the
# bottleneck is the COMPARATOR, not either engine. This mode never moves a
# result set: each engine computes two scalars over its own result —
# count(*) and an order-independent row hash (sum of the first 60 bits of
# md5 over a canonical per-row string, exact integer sum) — and only the
# scalars are compared, mirroring the driver's rows/schema/hash_match
# semantics. Doubles are quantized at 6 dp with the identical
# floor(x*1e6+0.5) expression on both engines (the driver's full compare at
# 9 dp already gates sf0.01; the engine-side twin trades 3 dp for zero
# transfer at any scale — values must still agree to half a millionth).
# Magnitude tiers: |x| < 9e12 uses the 6-dp scaling; larger magnitudes
# (the 640x relational replica pushed summed balances to ~2.4e13, which
# overflowed the 1e6-scaled BIGINT cast) fall to a 'B'-prefixed
# floor(x/4096) bucket — an exact double operation both engines compute
# identically, valid to ~3.7e22, and at those magnitudes the double's own
# granularity exceeds 1 so sub-unit precision is unrepresentable anyway.
# The prefix keeps the two tiers from ever colliding. Beyond 3.7e22 the
# cast fails loudly rather than comparing wrong.

_HEXD = "0123456789abcdef"
_NULL = "\x02"  # canonical NULL sentinel (never appears in real strings)
_SEP = "\x1f"


def _type_class(spark_type: str, duck_type: str) -> str:
    """Joint canonicalization class for one output column across engines."""
    def cls(t: str) -> str:
        t = t.upper()
        if t in ("DOUBLE", "FLOAT", "REAL") or (
            t.startswith("DECIMAL") and not t.endswith(",0)")
        ):
            return "float"
        if t in ("BIGINT", "INT", "INTEGER", "SMALLINT", "TINYINT",
                 "HUGEINT", "UBIGINT", "UINTEGER") or t.startswith("DECIMAL"):
            return "int"
        if t in ("STRING", "VARCHAR", "JSON"):  # DuckDB types json_* as JSON
            return "str"
        if t == "BOOLEAN":
            return "bool"
        if t.startswith("TIMESTAMP"):
            return "ts"
        raise ValueError(f"unsupported result type {t!r}")

    a, b = cls(spark_type), cls(duck_type)
    if a == b:
        return a
    if {a, b} == {"float", "int"}:  # e.g. Spark double vs DuckDB DECIMAL sum
        return "float"
    raise ValueError(f"incompatible classes {spark_type} vs {duck_type}")


def _canon_expr(col: str, cls: str, engine: str) -> str:
    """SQL expression canonicalizing one column to an identical string."""
    q = f"`{col}`" if engine == "spark" else f'"{col}"'
    if cls == "float":
        x = f"CAST({q} AS DOUBLE)"
        if engine == "spark":
            inf = f"{x} = double('Infinity')"
            ninf = f"{x} = double('-Infinity')"
        else:
            inf = f"(isinf({x}) AND {x} > 0)"
            ninf = f"isinf({x})"
        txt = "STRING" if engine == "spark" else "VARCHAR"
        return (
            f"CASE WHEN {q} IS NULL THEN '{_NULL}' "
            f"WHEN isnan({x}) THEN 'NaN' "
            f"WHEN {inf} THEN 'Inf' WHEN {ninf} THEN '-Inf' "
            f"WHEN abs({x}) >= 9.0e12 THEN concat('B', "
            f"CAST(CAST(floor({x} / 4096.0) AS BIGINT) AS {txt})) "
            f"ELSE CAST(CAST(floor({x} * 1000000.0 + 0.5) AS BIGINT)"
            f" AS {txt}) END"
        )
    if cls == "int":
        s = f"CAST({q} AS STRING)" if engine == "spark" else f"CAST({q} AS VARCHAR)"
        return f"COALESCE({s}, '{_NULL}')"
    if cls == "bool":
        body = f"CAST(CAST({q} AS INT) AS STRING)" if engine == "spark" \
            else f"CAST(CAST({q} AS INTEGER) AS VARCHAR)"
        return f"COALESCE({body}, '{_NULL}')"
    if cls == "ts":
        us = f"unix_micros({q})" if engine == "spark" else f"epoch_us({q})"
        cast = "STRING" if engine == "spark" else "VARCHAR"
        return f"COALESCE(CAST({us} AS {cast}), '{_NULL}')"
    if engine == "duck":  # JSON-typed columns need the explicit text cast
        return f"COALESCE(CAST({q} AS VARCHAR), '{_NULL}')"
    return f"COALESCE({q}, '{_NULL}')"  # str


def _py_duck_type(rows: list, idx: int, fallback: str) -> str:
    """DuckDB-equivalent type name for column idx of a callable-oracle result,
    inferred from the first non-None Python value (bool before int — bool is
    an int subclass). All-None columns fall back to the Spark type so
    _type_class resolves to a single class."""
    for r in rows:
        v = r[idx]
        if v is None:
            continue
        if isinstance(v, bool):
            return "BOOLEAN"
        if isinstance(v, int):
            return "BIGINT"
        if isinstance(v, float):
            return "DOUBLE"
        if isinstance(v, str):
            return "VARCHAR"
        if isinstance(v, datetime):
            return "TIMESTAMP"
        raise ValueError(f"unsupported oracle value type {type(v)!r}")
    return fallback


_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _canon_py(v, cls: str) -> str:
    """Python-side canonicalization for callable scale oracles: must emit
    byte-identical strings to _canon_expr's SQL for the same class (floats
    quantized floor(x*1e6+0.5), bools as 0/1, timestamps as epoch micros)."""
    if v is None:
        return _NULL
    if cls == "float":
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if math.isinf(f):
            return "Inf" if f > 0 else "-Inf"
        if abs(f) >= 9.0e12:
            return "B" + str(int(math.floor(f / 4096.0)))
        return str(int(math.floor(f * 1000000.0 + 0.5)))
    if cls == "int":
        return str(int(v))
    if cls == "bool":
        return str(int(bool(v)))
    if cls == "ts":
        if not isinstance(v, datetime):
            raise ValueError(f"ts class expects datetime, got {type(v)!r}")
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        return str((v - _EPOCH) // timedelta(microseconds=1))
    return str(v)  # str


def _duck_hex60(expr: str) -> str:
    """DuckDB lacks hex->int cast: 15-digit polynomial over md5 chars."""
    terms = [
        f"(strpos('{_HEXD}', substring({expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (14 - i)}"
        for i in range(15)
    ]
    return "(" + " + ".join(terms) + ")"


def _duck_hash_scalars(con, sql: str, o_cols, classes) -> tuple[int, int]:
    """(count, commutative row-hash) of one DuckDB statement — the hash is
    an exact integer SUM, so chunk scalars add to the single-shot value."""
    d_canon = ", ".join(
        _canon_expr(c, classes[c], "duck") for c in sorted(o_cols)
    )
    row = con.execute(
        f"WITH _r AS (SELECT concat_ws('{_SEP}', {d_canon}) AS _s"
        f" FROM ({sql})) SELECT count(*), COALESCE(sum("
        f"{_duck_hex60('md5(_s)')}), 0) FROM _r"
    ).fetchone()
    return row[0], int(row[1])


def compare_hash(spark_df, con, sql, name) -> tuple[bool, str, float, float]:
    """Count + order-independent row-hash on each engine; compare scalars."""
    s_cols = spark_df.columns
    s_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}

    pre_dur = 0.0
    chunked = isinstance(sql, ChunkedOracle)
    if chunked:  # per-chunk DuckDB-side hash; rows never enter Python
        con.execute(
            f"CREATE OR REPLACE TEMP VIEW _hc AS ({sql.chunk_sql(0, 1)} LIMIT 0)"
        )
        d_types = {
            r[0]: r[1] for r in con.execute("DESCRIBE _hc").fetchall()
        }
        o_cols = list(d_types)
    elif callable(sql):  # scale-oracle rows already live in Python
        t0 = time.perf_counter()
        o_cols, o_rows = sql(con)
        pre_dur = time.perf_counter() - t0
        d_types = {
            c: _py_duck_type(o_rows, i, s_types.get(c, "BIGINT"))
            for i, c in enumerate(o_cols)
        }
    else:
        con.execute(f"CREATE OR REPLACE TEMP VIEW _hc AS ({sql})")
        d_types = {
            r[0]: r[1] for r in con.execute("DESCRIBE _hc").fetchall()
        }
        o_cols = list(d_types)
    if sorted(s_cols) != sorted(o_cols):
        return False, f"cols {sorted(s_cols)} != {sorted(o_cols)}", 0.0, 0.0

    classes = {
        c: _type_class(s_types[c], d_types[c]) for c in sorted(s_cols)
    }

    t0 = time.perf_counter()
    s_canon = ", ".join(
        _canon_expr(c, classes[c], "spark") for c in sorted(s_cols)
    )
    s_row = spark_df.selectExpr(
        f"concat_ws('{_SEP}', {s_canon}) AS _s"
    ).selectExpr(
        "count(*) AS n",
        "COALESCE(sum(CAST(conv(substring(md5(_s), 1, 15), 16, 10)"
        " AS DECIMAL(38, 0))), 0) AS h",
    ).collect()[0]
    s_n, s_h = s_row["n"], int(s_row["h"])
    t_spark = time.perf_counter() - t0

    t0 = time.perf_counter()
    if chunked:
        n = sql.n_chunks()
        o_n = o_h = 0
        for i in range(n):
            cn, ch = _duck_hash_scalars(
                con, sql.chunk_sql(i, n), o_cols, classes
            )
            o_n += cn
            o_h += ch
    elif callable(sql):
        import hashlib

        o_n, o_h = len(o_rows), 0
        idx_cls = [(o_cols.index(c), classes[c]) for c in sorted(o_cols)]
        for r in o_rows:
            s = _SEP.join(_canon_py(r[i], cls) for i, cls in idx_cls)
            o_h += int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    else:
        o_n, o_h = _duck_hash_scalars(con, "SELECT * FROM _hc", o_cols, classes)
    t_ddb = pre_dur + (time.perf_counter() - t0)

    if s_n != o_n:
        return False, f"rows spark={s_n} oracle={o_n}", t_spark, t_ddb
    if s_h != o_h:
        return False, f"hash spark={s_h} oracle={o_h} (n={s_n})", t_spark, t_ddb
    return True, f"{s_n} rows, hash ok", t_spark, t_ddb


def _parse_size_gb(s: str) -> float:
    """'48g' / '8G' / '512m' / '90GB' -> GiB as float."""
    t = s.strip().lower().removesuffix("b")
    if t.endswith("g"):
        return float(t[:-1])
    if t.endswith("m"):
        return float(t[:-1]) / 1024.0
    if t.endswith("k"):
        return float(t[:-1]) / 1024.0**2
    return float(t) / 2**30  # bare bytes


def resolve_ddb_memory(
    override: str | None = None,
    meminfo_path: str = "/proc/meminfo",
    jvm_heap: str | None = None,
) -> str:
    """DuckDB memory_limit for the in-process oracle, resolved from box RAM
    minus the Spark driver JVM's projected footprint (r12 verdict task 6 —
    the 640x rung needed a hand-set SWEEP_DDB_MEM=90GB; now the standing
    rung runs with zero hand knobs).

    ``override`` (the SWEEP_DDB_MEM env) always wins. Otherwise: start from
    MemAvailable (falling back to MemTotal, then to the old 24GB constant
    when /proc/meminfo is unreadable), subtract 1.3x the JVM heap the sweep
    is ABOUT to start (get_spark honors SPARK_DRIVER_MEMORY, default 8g;
    the 1.3 covers off-heap buffers + metaspace + GC headroom) and a 6 GiB
    OS/page-cache floor, never going below 8GB so small boxes still spill
    to disk instead of refusing to run. DuckDB connects BEFORE the JVM
    starts here; if a JVM is already resident, MemAvailable has shrunk by
    its RSS and the subtraction is merely conservative."""
    if override:
        return override
    avail_kb = total_kb = None
    try:
        with open(meminfo_path) as f:
            for ln in f:
                if ln.startswith("MemAvailable:"):
                    avail_kb = int(ln.split()[1])
                elif ln.startswith("MemTotal:"):
                    total_kb = int(ln.split()[1])
    except OSError:
        return "24GB"
    base_kb = avail_kb if avail_kb is not None else total_kb
    if base_kb is None:
        return "24GB"
    heap_gb = _parse_size_gb(jvm_heap or os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    budget_gb = base_kb / 2**20 - 1.3 * heap_gb - 6.0
    return f"{max(8, int(budget_gb))}GB"


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
    ap.add_argument(
        "--hash-compare",
        action="store_true",
        help="engine-side count + order-independent row-hash; no result-set "
        "transfer (for SFs where the collect comparator dominates)",
    )
    ap.add_argument(
        "--sample-mod",
        type=int,
        default=None,
        metavar="M",
        help="sampled-oracle mode: sweep against a deterministic input "
        "slice (documents.doc_id %% M == 0, embeddings.vec_id %% M == 0; "
        "other tables symlinked) so the oracle's from-scratch "
        "minhash/shingle cost drops ~M-fold — the sf10 straggler mode "
        "(combine with --hash-compare)",
    )
    args = ap.parse_args()

    con = duckdb.connect()
    # Bound the in-process oracle: DuckDB defaults to ~80% of RAM and ALL
    # cores, but it shares this process with a multi-GB Spark driver JVM —
    # unbounded, a big hash build dies with a bad-allocation OOM instead of
    # spilling (bit the sf10 sweep at 48g JVM heap). An explicit limit +
    # temp dir makes it spill to disk; fewer threads leaves Spark its cores.
    ddb_mem = resolve_ddb_memory(os.environ.get("SWEEP_DDB_MEM"))
    print(f"duckdb memory_limit = {ddb_mem} (auto unless SWEEP_DDB_MEM set)",
          flush=True)
    con.execute(f"SET memory_limit = '{ddb_mem}'")
    con.execute("SET threads = 16")
    con.execute("SET temp_directory = '/tmp/duckdb_sweep_spill'")
    # Both compare paths are order-independent (the full compare sorts, the
    # hash compare is a commutative sum), so DuckDB's insertion-order
    # guarantee buys nothing here — dropping it lets wide aggregations and
    # joins stream instead of buffering (big spill reduction on the
    # signature/shingle oracles at sf10).
    con.execute("SET preserve_insertion_order = false")
    if args.sample_mod:
        sliced = build_slice(con, args.sf_dir, args.sample_mod)
        print(
            f"sampled-oracle mode: doc_id/vec_id % {args.sample_mod} == 0 "
            f"slice of {args.sf_dir} -> {sliced}",
            flush=True,
        )
        args.sf_dir = sliced
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    for oracle in SCALE_ORACLES.values():
        if isinstance(oracle, ChunkedOracle):
            oracle._src_dir = args.sf_dir  # auto-size chunks to this rung

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
            if args.hash_compare:
                match, msg, ts, td = compare_hash(df, con, oracle, name)
            else:
                match, msg, ts, td = compare(df, con, oracle)
        except Exception as exc:  # a crash is a failure, keep sweeping
            match, msg, ts, td = False, f"{type(exc).__name__}: {exc}"[:300], 0, 0
        status = "MATCH" if match else "FAIL "
        tag = ""
        if alt and isinstance(oracle, ChunkedOracle):
            tag = f" [alt-oracle chunked x{oracle.n_chunks()}]"
        elif alt:
            tag = " [alt-oracle union-find%s]" % (
                ", pairs cached" if _PAIR_HIT else ""
            )
        print(f"{status} {name:40s} spark={ts:7.2f}s duckdb={td:7.2f}s  {msg}{tag}",
              flush=True)
        ok += match
        bad += not match
        if not match:
            failures.append(name)
    mode = f" [sample-mod {args.sample_mod}]" if args.sample_mod else ""
    print(f"\n{ok}/{ok + bad} match at {args.sf_dir}{mode}"
          + (f"; FAILURES: {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
