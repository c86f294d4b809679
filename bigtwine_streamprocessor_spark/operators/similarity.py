"""Similarity search over embedding columns (`embeddings` table: vec_id,
embedding array<float>, label).

Three paths, as a 100 TB pipeline needs all of them:

* **brute-force cosine top-k** — exact baseline: broadcast the (small) query
  set against the full corpus; per-row dot product with `zip_with` +
  `aggregate` higher-order functions (JVM-side, no Python); top-k via ranking
  window partitioned by query. Scales as O(|Q| * N) with N fully partitioned —
  right answer for |Q| small.
* **sign-LSH bucketed ANN** — scale path: ``n_bits`` data-independent
  Rademacher (+-1) hyperplanes derived from a portable LCG give a
  ``2^n_bits``-bucket code; candidates = rows in the query's bucket or any
  bucket at Hamming distance <= ``probe_radius`` (multiprobe), then exact
  cosine on candidates only. Bucket count — and with it join parallelism and
  per-bucket candidate size — is a dial: 2^16 buckets default, so a
  1000-executor cluster shuffles on ~65k uniform keys instead of 16 (the
  round-1 ceiling this replaces).
* **IVF top-k** — cluster-aware scale path: coarse-quantize into ``n_cells``
  cells with a real (unrolled-Lloyd) k-means over stratified deterministic
  seeds; corpus vectors live in their nearest cell, queries probe their
  ``n_probe`` nearest cells. Candidates ~ n_probe/n_cells of the corpus, and
  cells follow the data distribution instead of the first-k vectors (the
  round-1 skew hazard this replaces). ``n_cells ~ sqrt(n)`` is the classic
  sizing at scale.

Every variant is oracle-gated: the DuckDB SQL twins are generated from the
SAME constants (bit/LCG arithmetic, seed stride, iteration count), so engine
and oracle stay in lock-step as parameters move. Cosines, plane projections,
and centroid components round to 6 decimals on BOTH sides so float summation
order can't flip a comparison; ties break on id.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache, reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark.fp import rd as _rd, rd_sql as _rd_sql

N_BITS = 16  # sign-LSH hyperplanes (2^16 buckets) — scale default
PROBE_RADIUS = 1  # multiprobe Hamming radius (0 = exact bucket only)
SALT_CAP = 256  # bucket rows per salt slice in the near-dup self-join
COS_ROUND = 6
IVF_CELLS = 16
IVF_PROBE = 4
IVF_ITERS = 2
# Fixed query-vector window: every top-k query scores the first N_QUERIES
# vec_ids against the corpus. One named constant so tooling that slices the
# input (scripts/oracle_sweep.py --sample-mod) can RETAIN this window — a
# %mod slice that drops 19 of the 20 query vectors still matches, but
# checks almost nothing (PERF.md r11 thin-out caveat).
N_QUERIES = 20

# ±1 hyperplane components. r1-r6 derived these in-SQL from a truncated
# LCG — a structural mistake found by the r7 14-bit occupancy probe: LCG
# composition is AFFINE, so planes generated at constant strides stay
# mutually correlated no matter how many rounds, and the correlated family
# concentrated ~2.8% of RANDOM-direction vectors into single buckets (450x
# the uniform 2^-14; measured max bucket 5,543 of 200k). The signs are
# data-independent CONSTANTS, so no in-SQL PRNG is needed at all: they are
# precomputed here from md5 (crypto-grade mixing) and embedded as literal
# arrays into both engines' expressions — identical by construction, and
# cheaper per row than re-deriving an LCG per component. Re-measured on the
# same corpus: max 14-bit bucket 134, 15,924 of 16,384 buckets occupied.
# Sign vectors cover embeddings up to this many dims. Kept at the corpus
# dimension on purpose: every literal is a codegen'd constant, and the
# plane family's FIXED cost scales with n_bits * _MAX_PLANE_DIM (measured
# on the warm 16-bit ANN query: 4.4 s at 256 literals/plane vs 2.0 s at
# 64). A wider corpus fails LOUDLY (ANSI element_at / DuckDB
# list_dot_product length mismatch) — bump the constant, don't pad it.
_MAX_PLANE_DIM = 64


@lru_cache(maxsize=None)
def _plane_signs(i: int) -> tuple[float, ...]:
    """Rademacher components of hyperplane i (md5 of "plane:i:j", LSB of
    the first digest byte), length _MAX_PLANE_DIM — sliced to the embedding
    dimension at use sites."""
    return tuple(
        1.0 if hashlib.md5(f"plane:{i}:{j}".encode()).digest()[0] % 2 else -1.0
        for j in range(_MAX_PLANE_DIM)
    )


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


_DOT_SQL = (
    "list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)
_NORM_SQL = (
    "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    n_queries: int = N_QUERIES,
    query_filter=None,
) -> DataFrame:
    """Exact cosine top-k neighbors for the first ``n_queries`` vectors
    (or an arbitrary ``query_filter`` Column over the same frame — the
    recall-curve path selects a held-out hash sample instead of the fixed
    gate window).

    Output: (query_id, neighbor_id, cos, rank). Self-pairs excluded.
    """
    from pyspark.sql import Window as W

    base = emb.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    # parallelism floor: the interpreted dot-product folds run on the scan
    # side of the broadcast join, and a low-split parquet read caps them
    # (13 splits serving 32 cores at 200k vectors) — same fix as _scored
    sc = emb.sparkSession.sparkContext
    if base.rdd.getNumPartitions() < sc.defaultParallelism:
        base = base.repartition(sc.defaultParallelism)
    qf = query_filter if query_filter is not None else (
        F.col("vec_id") < n_queries
    )
    q = base.filter(qf).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = _rd(
        _dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm")),
        COS_ROUND,
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_sql(k: int = 5, n_queries: int = N_QUERIES) -> str:
    return f"""
WITH norms AS (
    SELECT vec_id, embedding, {_NORM_SQL.format(a="embedding")} AS nrm
    FROM embeddings
),
pairs AS (
    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           (floor(({_DOT_SQL.format(a="q.embedding", b="n.embedding")}
                 / (q.nrm * n.nrm)) * power(10.0, {COS_ROUND}) + 0.5) / power(10.0, {COS_ROUND})) AS cos
    FROM norms q JOIN norms n ON n.vec_id <> q.vec_id
    WHERE q.vec_id < {n_queries}
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# sign-LSH: n_bits Rademacher hyperplanes + Hamming-radius multiprobe
# ---------------------------------------------------------------------------


def _plane_dot(i: int) -> Column:
    """Projection of ``embedding`` onto hyperplane i, rounded so an
    ulp-of-summation can't flip the sign differently engine vs oracle.
    element_at on the literal array beats slice+zip_with (no per-row
    array copy); the fold stays sequential left-to-right."""
    signs = F.array(*[F.lit(s) for s in _plane_signs(i)])
    return _rd(
        F.aggregate(
            F.transform(
                F.col("embedding"),
                lambda x, j: x.cast("double") * F.element_at(signs, j + 1),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
        COS_ROUND,
    )


def bucket_col(n_bits: int, table: int = 0) -> Column:
    """The n_bits-bit sign-LSH bucket of ``embedding`` as an int Column.

    ``table`` selects an INDEPENDENT plane family for multi-table
    OR-amplification: table t uses global planes ``t*n_bits .. (t+1)*n_bits-1``
    of the md5 Rademacher family, so table 0 is bit-identical to the
    single-table layout (existing indexes and oracles unchanged) and any two
    tables share no plane. OR-ing candidates across L tables is the standard
    recall lever for sign-LSH on clustered data: a true neighbor split by one
    random family is whole-bucket-colliding in another with independent
    probability, so misses multiply out (r8 measurement: radius-widening a
    SINGLE family bought +0.10 recall for 41x candidates; an extra table buys
    more recall for ~2x)."""
    bits = [
        F.when(_plane_dot(table * n_bits + i) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        for i in range(n_bits)
    ]
    return reduce(add, bits).cast("int")


def _plane_dot_sql(i: int, emb: str = "embedding") -> str:
    # Same literal sign vector as the Spark side, via native
    # list_dot_product (a list literal inside a DuckDB LAMBDA is rebuilt
    # per ELEMENT — measured ~3 ms per plane dot, 500x the arithmetic —
    # and an unrolled `+` chain trips the binder's 128-deep nesting cap;
    # the native kernel builds the literal once per row and loops in C).
    # Its summation order may differ from the Spark aggregate's sequential
    # fold by an ulp; both sides round at COS_ROUND before the sign
    # decision, so a flip needs the true value within ~1e-11 of a rounding
    # boundary — negligible against the corpus spread, and the oracle gate
    # would surface it loudly if it ever landed.
    lits = ", ".join("1.0" if s > 0 else "-1.0" for s in _plane_signs(i))
    return (
        f"(floor(list_dot_product(CAST({emb} AS DOUBLE[]), "
        f"([{lits}])[1:len({emb})]) * power(10.0, {COS_ROUND}) + 0.5) "
        f"/ power(10.0, {COS_ROUND}))"
    )


def bucket_sql(n_bits: int, emb: str = "embedding", table: int = 0) -> str:
    terms = " + ".join(
        f"(CASE WHEN {_plane_dot_sql(table * n_bits + i, emb)} >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(n_bits)
    )
    return f"CAST({terms} AS INT)"


_MAX_PROBES = 1024


def _probe_masks(n_bits: int, probe_radius: int) -> list[int]:
    """Distinct XOR masks with popcount <= probe_radius (0 first = the
    bucket itself). Data-independent, so both engine twins expand the SAME
    Python-generated list into literals. The count is sum of C(n_bits, r)
    for r <= radius — it multiplies the broadcast query side AND the
    candidate volume, so growth past _MAX_PROBES raises: at that point the
    right fix is more bits or the IVF path, not a wider probe ring."""
    from itertools import combinations

    masks = [0]
    for r in range(1, probe_radius + 1):
        masks += [
            sum(1 << i for i in bits) for bits in combinations(range(n_bits), r)
        ]
    if len(masks) > _MAX_PROBES:
        raise ValueError(
            f"probe_radius={probe_radius} at n_bits={n_bits} means "
            f"{len(masks)} probes per query (> {_MAX_PROBES})"
        )
    return masks


def _probes(bucket: Column, n_bits: int, probe_radius: int) -> Column:
    """Array of buckets to probe: every Hamming-<=radius neighbor of the
    bucket. Probe values are distinct, so a (query, neighbor) pair joins
    at most once — no dedup needed."""
    return F.array(
        *[
            bucket.bitwiseXOR(F.lit(m)) if m else bucket
            for m in _probe_masks(n_bits, probe_radius)
        ]
    )


def _probes_sql(n_bits: int, probe_radius: int, bucket: str = "bucket") -> str:
    return (
        "["
        + ", ".join(
            f"xor({bucket}, {m})" if m else bucket
            for m in _probe_masks(n_bits, probe_radius)
        )
        + "]"
    )


def _bucket_col_names(n_tables: int) -> list[str]:
    """Column names of the per-table bucket ids: ``bucket`` (table 0, the
    pre-multi-table name so single-table layouts/oracles are unchanged),
    then ``bucket_1`` .. ``bucket_{L-1}``."""
    return ["bucket"] + [f"bucket_{t}" for t in range(1, n_tables)]


def _guarded_bucket(n_bits: int, table: int = 0) -> Column:
    # Width guard, config-proof: under ANSI (pinned by session.get_spark,
    # and the Spark 4 default) an over-wide embedding already errors inside
    # element_at, but a non-ANSI caller-provided session (the external
    # driver builds its own) would get NULL plane components — every vector
    # silently collapses into bucket 0 (O(n^2) candidates) while the DuckDB
    # twin errors. raise_error sits in the otherwise-branch, so conforming
    # rows pay one size() comparison. Applied per table column so the guard
    # survives column pruning of any subset.
    return F.when(
        F.size(F.col("embedding")) <= F.lit(_MAX_PLANE_DIM),
        bucket_col(n_bits, table),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "embedding wider than _MAX_PLANE_DIM="
                    f"{_MAX_PLANE_DIM}: dim="
                ),
                F.size(F.col("embedding")).cast("string"),
                F.lit(" — bump similarity._MAX_PLANE_DIM, don't pad"),
            )
        ).cast("int")
    )


def _bucketed(emb: DataFrame, n_bits: int, n_tables: int = 1) -> DataFrame:
    names = _bucket_col_names(n_tables)
    return emb.select(
        "vec_id",
        "embedding",
        *[
            _guarded_bucket(n_bits, t).alias(name)
            for t, name in enumerate(names)
        ],
        _norm(F.col("embedding")).alias("nrm"),
    )


def _ensure_tables(base: DataFrame, n_bits: int, n_tables: int) -> DataFrame:
    """Add any ``bucket_t`` columns the frame lacks, derived on the fly from
    ``embedding`` — lets a recall sweep probe MORE tables than an index
    materialized (extra tables cost plane dots at query time; tables the
    layout carries stay zero-cost off the parquet scan)."""
    for t, name in enumerate(_bucket_col_names(n_tables)):
        if name not in base.columns:
            base = base.withColumn(name, _guarded_bucket(n_bits, t))
    return base


def bucketize_corpus(
    emb: DataFrame,
    path: str,
    n_bits: int = N_BITS,
    n_files: int | None = None,
    partition_by_bucket: bool = False,
    n_tables: int = 1,
) -> None:
    """Ingest-time LSH bucket materialization — the 100 TB-correct layout.

    The plane family is a data-independent constant, so bucket ids never
    change: compute them ONCE at write time instead of re-hashing the whole
    corpus on every query (the query-time fixed cost the r7 decorrelated
    plane family added to ``ann_lsh_topk``). Writes ``(vec_id, embedding,
    bucket, nrm)`` parquet clustered by bucket: hash-repartitioned on
    ``bucket`` so each bucket's rows co-locate in one file, and sorted
    within files so parquet row-group min/max stats prune bucket probes at
    scan time. On a cluster, pass ``n_files`` to size output files
    explicitly (default: session shuffle partitions).

    ``partition_by_bucket=True`` writes a Hive-partitioned layout
    (``bucket=<id>/`` directories) instead: the bucket-probe join then
    qualifies for Catalyst's dynamic partition pruning, so a query scans
    ONLY its probed buckets' files — ~(n_probes/2^n_bits) of the corpus
    instead of all of it. That is the right trade at 100 TB (2^16 dirs of
    ~1.5 GB each); below ~10 GB the flat clustered layout wins on file
    count and listing cost, so it stays the default.

    ``n_tables > 1`` materializes the extra OR-amplification bucket columns
    (``bucket_1``..) alongside — the SERVING-quality layout (see
    ``ann_lsh_topk``). Layout clustering/partitioning stays on table 0's
    ``bucket``; the extra tables' candidate scans are column-pruned to
    (vec_id, bucket_t) ints, so they read ~16 bytes/vector of a layout
    whose width is dominated by the embedding column.
    """
    out = _bucketed(emb, n_bits, n_tables)
    layout = "hive" if partition_by_bucket else "flat"
    _write_bucket_clustered(out, path, layout, n_files, mode="overwrite")
    # meta sidecar AFTER the corpus write (overwrite clears the dir first);
    # underscore-prefixed paths are invisible to Spark's file listing and
    # partition discovery (the _SUCCESS convention), so it never pollutes
    # reads of either layout
    _write_index_meta(
        out.sparkSession,
        path,
        {
            "kind": "lsh",
            "n_bits": n_bits,
            "layout": layout,
            "n_tables": n_tables,
        },
    )


def _write_bucket_clustered(
    out: DataFrame, path: str, layout: str, n_files: int | None, mode: str
) -> None:
    if layout == "hive":
        # one write task per bucket directory; rows of a bucket co-locate
        out.repartition(F.col("bucket")).write.mode(mode).partitionBy(
            "bucket"
        ).parquet(path)
        return
    out = (
        out.repartition(n_files, F.col("bucket"))
        if n_files is not None
        else out.repartition(F.col("bucket"))
    )
    # (bucket, vec_id): vec_id breaks ties so the layout is CANONICAL —
    # two histories holding the same rows (streamed appends+compact vs a
    # batch rebuild) compact to byte-identical files (r10 sf10 drive:
    # bucket-only sort left tie order history-dependent). Row-group
    # bucket stats are unchanged; the extra sort key is free at write.
    out.sortWithinPartitions("bucket", "vec_id").write.mode(mode).parquet(
        path
    )


def _write_index_meta(spark, path: str, meta: dict) -> None:
    import json

    # JVM-native 1-row frame, NOT createDataFrame: coalesce(1) over a
    # Python LocalRelation pays a ~5 s Arrow-fallback serialization in this
    # environment (measured r10 — it was the single largest line in the
    # dedup_incremental gate composite); range(1).select(lit) writes the
    # same sidecar in ~0.3 s
    spark.range(1).select(F.lit(json.dumps(meta)).alias("meta")).coalesce(
        1
    ).write.mode("overwrite").json(f"{path}/_index_meta")


def read_index_meta(spark, path: str) -> dict | None:
    """Read the ``_index_meta`` sidecar of an index layout (None if absent —
    e.g. an index written before the sidecar existed)."""
    import json

    try:
        rows = spark.read.json(f"{path}/_index_meta").collect()
    except Exception:
        return None
    if not rows or "meta" not in rows[0].asDict():
        return None
    return json.loads(rows[0]["meta"])


def append_to_bucketized(
    emb_delta: DataFrame,
    path: str,
    n_bits: int | None = None,
    n_files: int | None = None,
    subdir: str | None = None,
) -> None:
    """Delta ingest for a ``bucketize_corpus`` layout — the maintenance half
    of the ingest-time index story. At 100 TB an index is never rebuilt for
    a day's arrivals: the plane family is a data-independent constant, so a
    delta's bucket ids are computed over the DELTA ONLY (no touch of the
    existing corpus) and appended in the layout the index already uses
    (auto-detected from the ``_index_meta`` sidecar, falling back to a
    one-row ``input_file_name`` probe for pre-sidecar indexes).
    ``n_bits=None`` (the default) takes the plane count from the sidecar;
    an explicit value must AGREE with the sidecar or this raises —
    appending under a different plane count would silently corrupt every
    probe join.

    Caller contract: delta ``vec_id``s are new (same as any append sink).
    Each append adds >=1 file per touched bucket; see
    ``compact_bucketized`` for the periodic rewrite that keeps file counts
    bounded, and ``bucketized_stats`` for the occupancy/skew signal that
    says when ``n_bits`` itself needs to grow (a rebuild).

    ``subdir`` (e.g. ``delta-e17``) makes the append replay-IDEMPOTENT for
    a streaming ingester: the delta lands as an OVERWRITE of
    ``<path>/<subdir>/`` so a replayed epoch re-lands on the same directory
    instead of doubling rows. Flat layout only — the Hive layout's
    top-level ``bucket=`` partition dirs cannot nest epoch dirs without
    breaking partition discovery; a streaming ingester uses the flat
    layout and periodic compaction (which flattens the epoch dirs)."""
    spark = emb_delta.sparkSession
    meta = read_index_meta(spark, path)
    if meta is not None:
        if n_bits is not None and meta.get("n_bits") != n_bits:
            raise ValueError(
                f"index at {path} was built with n_bits={meta.get('n_bits')}, "
                f"append called with n_bits={n_bits}"
            )
        n_bits = meta.get("n_bits", n_bits)
        layout = meta.get("layout", "flat")
        # a multi-table index's deltas must carry every table's bucket
        # column — a single-table append would leave NULL bucket_t holes
        # that silently drop the delta from table t's probes
        n_tables = int(meta.get("n_tables", 1))
    else:
        n_tables = 1
        if n_bits is None:
            raise ValueError(
                f"index at {path} has no _index_meta sidecar; pass n_bits= "
                "explicitly (it must match the value the index was built with)"
            )
        layout = "hive" if _is_hive_bucket_layout(spark, path) else "flat"
    if subdir is not None:
        if layout != "flat":
            raise ValueError(
                "epoch-subdir appends require the flat layout; the hive "
                "layout's bucket= partition dirs cannot nest epoch dirs"
            )
        _write_bucket_clustered(
            _bucketed(emb_delta, n_bits, n_tables),
            f"{path.rstrip('/')}/{subdir}",
            "flat",
            n_files,
            mode="overwrite",
        )
        return
    _write_bucket_clustered(
        _bucketed(emb_delta, n_bits, n_tables), path, layout, n_files, mode="append"
    )


def _is_hive_bucket_layout(spark, path: str) -> bool:
    # storage-agnostic one-row probe (no driver-side FS listing): Hive
    # layout files live under bucket=<id>/ directories
    row = spark.read.parquet(path).select(F.input_file_name().alias("f")).head(1)
    return bool(row) and "/bucket=" in row[0]["f"]


def read_bucketized(spark, path: str) -> DataFrame:
    """Read a ``bucketize_corpus`` output; schema-identical to ``_bucketed``,
    accepted by ``ann_lsh_topk``/``embedding_neardup_pairs`` via
    ``bucketed=`` so the query plan starts from the materialized buckets
    (zero plane-dot work at query time). Works for both layouts: in the
    Hive-partitioned one ``bucket`` comes back as a partition column
    (cast to the ``_bucketed`` int type so downstream joins are
    type-identical), which is what makes bucket-probe joins prunable."""
    meta = read_index_meta(spark, path)
    hive = (meta or {}).get("layout") == "hive" or (
        meta is None and _is_hive_bucket_layout(spark, path)
    )
    # flat layouts read recursively so streaming epoch subdirs (see
    # append_to_bucketized) are transparent; hive keeps partition discovery
    df = (
        spark.read.parquet(path)
        if hive
        else spark.read.option("recursiveFileLookup", "true").parquet(path)
    )
    extra_tables = sorted(
        (c for c in df.columns if c.startswith("bucket_")),
        key=lambda c: int(c.split("_")[1]),
    )
    cols = (
        ["vec_id", "embedding", F.col("bucket").cast("int").alias("bucket")]
        + [F.col(c).cast("int").alias(c) for c in extra_tables]
        + ["nrm"]
    )
    return df.select(*cols)


def _layout_stats(df: DataFrame, key: str) -> dict:
    # one distributed agg -> one driver-side scalar row (monitoring utility,
    # same envelope as the export pre-count): per-key occupancy histogram
    # reduced to the numbers a retrain/compact decision needs
    occ = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    row = occ.agg(
        F.sum("n").alias("n_vectors"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_key"),
        F.avg("n").alias("mean_key"),
        F.expr("approx_percentile(n, 0.99)").alias("p99_key"),
    ).collect()[0]
    n_files = df.select(F.input_file_name()).distinct().count()
    mean = float(row["mean_key"] or 0.0)
    return {
        "n_vectors": int(row["n_vectors"] or 0),
        f"n_{key}s": int(row["n_keys"]),
        f"max_{key}": int(row["max_key"] or 0),
        f"mean_{key}": round(mean, 2),
        f"p99_{key}": int(row["p99_key"] or 0),
        "n_files": n_files,
        "skew": round((row["max_key"] or 0) / mean, 2) if mean else 0.0,
    }


def bucketized_stats(spark, path: str) -> dict:
    """Occupancy/health summary of a ``bucketize_corpus`` layout: vector and
    file counts plus the bucket histogram's max/mean/p99 and skew
    (max/mean). The two maintenance signals at scale: ``n_files`` growing
    past ~2-3x the bucket count says run ``compact_bucketized``; mean
    occupancy growing past the salted-join comfort zone (~``SALT_CAP``) or
    skew past ~8x says the corpus outgrew ``n_bits`` — rebuild with more
    planes (the histogram is exactly the r7 occupancy-probe read, made a
    first-class API)."""
    return _layout_stats(read_bucketized(spark, path), "bucket")


def ivf_index_stats(spark, path: str) -> dict:
    """Cell-occupancy summary of a ``build_ivf_index`` layout — same signals
    as ``bucketized_stats`` but for the k-means path, where skew also means
    the FROZEN quantizer has drifted from the data distribution (appends
    assign to nearest existing centroid; a skewed histogram says retrain
    via ``build_ivf_index`` with fresh centroids)."""
    corpus, cents = read_ivf_index(spark, path)
    stats = _layout_stats(corpus, "cell")
    # quantizer-fit drift signal (r8 verdict task 5): occupancy skew says
    # the layout stopped partitioning, but a shifted ingest distribution
    # can decay recall long before the histogram skews — each appended
    # vector still lands in SOME nearest cell, just a badly-fitting one.
    # mean cosine-to-assigned-centroid is the number that falls instead.
    stats["mean_assigned_cos"] = _mean_fit(corpus, cents)
    return stats


def _fit_col() -> Column:
    return _rd(
        _dot(F.col("embedding"), F.col("c_emb"))
        / (_norm(F.col("embedding")) * _norm(F.col("c_emb"))),
        COS_ROUND,
    )


def _mean_fit(corpus: DataFrame, cents: DataFrame) -> float:
    if "a_rank" in corpus.columns:
        # spilled layout: quantizer fit is a property of the PRIMARY
        # assignment; averaging in the spill copies (by construction
        # worse-fitting) would read as phantom drift
        corpus = corpus.filter(F.col("a_rank") == 1)
    row = (
        corpus.join(F.broadcast(cents), F.col("cell") == F.col("cid"))
        .agg(F.avg(_fit_col()).alias("fit"))
        .collect()[0]
    )
    return round(float(row["fit"] or 0.0), 4)


def ivf_drift_stats(spark, path: str) -> dict:
    """Per-epoch quantizer-fit read for a ``build_ivf_index`` layout: mean
    cosine of each indexed vector to its ASSIGNED centroid, broken out by
    append epoch (``delta-e<N>`` subdirs; the original build is ``base``).
    A declining epoch series is the drift signature — arrivals fit the
    frozen quantizer worse and worse, recall decays silently — and the
    retrain trigger (``retrain_ivf_index`` / ``--op retrain``). One
    distributed agg, one small collect (rows = epochs)."""
    corpus, cents = read_ivf_index(spark, path)
    if "a_rank" in corpus.columns:
        corpus = corpus.filter(F.col("a_rank") == 1)  # see _mean_fit
    epoch_raw = F.regexp_extract(F.input_file_name(), r"(delta-e\d+)", 1)
    per = (
        corpus.withColumn(
            "epoch", F.when(epoch_raw == "", F.lit("base")).otherwise(epoch_raw)
        )
        .join(F.broadcast(cents), F.col("cell") == F.col("cid"))
        .groupBy("epoch")
        .agg(
            F.avg(_fit_col()).alias("fit"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    epochs = {
        r["epoch"]: {
            "mean_assigned_cos": round(float(r["fit"] or 0.0), 4),
            "n_vectors": int(r["n"]),
        }
        # numeric epoch order ("base" first, then delta-e2 < delta-e10):
        # lexicographic sort misorders past 9 appends and makes a genuine
        # decline look non-monotone
        for r in sorted(
            per,
            key=lambda r: (
                r["epoch"] != "base",
                int(r["epoch"].rsplit("-e", 1)[-1]) if r["epoch"] != "base" else -1,
            ),
        )
    }
    total = sum(e["n_vectors"] for e in epochs.values()) or 1
    overall = (
        sum(e["mean_assigned_cos"] * e["n_vectors"] for e in epochs.values())
        / total
    )
    return {"mean_assigned_cos": round(overall, 4), "per_epoch": epochs}


def retrain_ivf_index(
    spark,
    path: str,
    n_cells: int | None = None,
    n_iters: int = IVF_ITERS,
    sample_mod: int = 1,
    n_files: int | None = None,
) -> dict:
    """Recluster a drifted IVF quantizer in place: train fresh centroids on
    the indexed corpus (optionally a deterministic 1-in-``sample_mod``
    hash sample of it — at 100 TB Lloyd never scans the full corpus), lay
    the SAME rows out under the new cells into a staging dir, verify the
    row count, and swap — the rebuild-verify-swap discipline of
    ``compact_bucketized`` applied to a retrain (at real scale: a
    transactional table-format rewrite; remote paths rejected the same
    way). Returns the before/after quantizer fit so the caller sees what
    the retrain bought; recall measurement stays the ``--op recall``
    verb's job."""
    import shutil

    _reject_remote_compaction(path)
    meta = read_index_meta(spark, path) or {}
    n_cells = int(n_cells or meta.get("n_cells", IVF_CELLS))
    spill = int(meta.get("spill", 1))
    corpus, old_cents = read_ivf_index(spark, path)
    fit_before = _mean_fit(corpus, old_cents)
    if spill > 1:  # distinct vectors; the rebuild re-spills below
        corpus = corpus.filter(F.col("a_rank") == 1)
    emb = corpus.select("vec_id", "embedding")
    train = (
        emb
        if sample_mod <= 1
        else emb.filter(F.pmod(F.xxhash64(F.col("vec_id")), sample_mod) == 0)
    )
    # counted BEFORE the swap: this plan's resolved file list points at the
    # pre-swap corpus files, which the swap deletes
    n_train = train.count() if sample_mod > 1 else None
    cents = kmeans_centroids(train, n_cells, n_iters)
    staging = path.rstrip("/") + ".retraining"
    shutil.rmtree(staging, ignore_errors=True)
    build_ivf_index(
        emb, staging, n_cells=n_cells, n_files=n_files, centroids=cents,
        spill=spill,
    )
    new_corpus, new_cents = read_ivf_index(spark, staging)
    n_src, n_dst = emb.count(), new_corpus.count()
    # a vector can only spill into as many cells as actually SURVIVED
    # training (advisor r13: a legitimate retrain down to n_cells < spill
    # must not trip this; Lloyd can additionally drop empty cells, so the
    # capacity bound is the trained centroid count, not the requested one)
    eff_spill = min(spill, new_cents.count())
    if n_dst != n_src * eff_spill:
        raise RuntimeError(
            f"retrain row-count mismatch at {staging}: {n_dst} != "
            f"{n_src} x effective spill {eff_spill}"
        )
    fit_after = _mean_fit(new_corpus, new_cents)
    _swap_staged(spark, path, staging)
    return {
        "rows": n_src,
        "n_cells": n_cells,
        "trained_on": n_train if n_train is not None else n_src,
        "mean_assigned_cos_before": fit_before,
        "mean_assigned_cos_after": fit_after,
    }


def compact_bucketized(spark, path: str, n_files: int | None = None) -> dict:
    """Rewrite a ``bucketize_corpus`` layout in place to undo append-driven
    small-file growth (each ``append_to_bucketized`` adds >=1 file per
    touched bucket; parquet scan cost is per-file, so hundreds of appends
    without compaction turn a clustered scan into a file-listing problem).

    Local-filesystem recipe: rewrite clustered into a staging dir, verify
    the row count, then swap directories. On an object store or HDFS at
    real scale the swap must be a transactional table-format operation
    (e.g. an Iceberg/Delta rewrite — their compaction IS this function), so
    non-local schemes are rejected loudly rather than half-swapped.
    Returns ``{"rows", "files_before", "files_after"}``."""
    _reject_remote_compaction(path)
    meta = read_index_meta(spark, path) or {}
    layout = meta.get("layout") or (
        "hive" if _is_hive_bucket_layout(spark, path) else "flat"
    )

    def write_clustered(src, staging):
        _write_bucket_clustered(src, staging, layout, n_files, mode="overwrite")
        if meta:
            _write_index_meta(spark, staging, meta)

    return _staged_compact(spark, path, read_bucketized, write_clustered)


def compact_ivf_index(spark, path: str, n_files: int | None = None) -> dict:
    """Compaction for a ``build_ivf_index`` layout: re-cluster ``corpus/``
    by cell in place (same staged-rewrite-verify-swap recipe as
    ``compact_bucketized``, applied to the corpus subdir only). The rows
    already carry their cell assignment and norm, so unlike a rebuild this
    NEVER rescores against the centroids — pure re-layout, and the frozen
    quantizer (``centroids/`` and the sidecar) is untouched."""
    corpus_dir = path.rstrip("/") + "/corpus"

    def write_clustered(src, staging):
        out = (
            src.repartition(n_files, F.col("cell"))
            if n_files is not None
            else src.repartition(F.col("cell"))
        )
        out.sortWithinPartitions("cell").write.mode("overwrite").parquet(
            staging
        )

    return _staged_compact(
        spark,
        corpus_dir,
        lambda s, p: s.read.option("recursiveFileLookup", "true").parquet(p),
        write_clustered,
    )


def _reject_remote_compaction(path: str) -> None:
    # local-filesystem staged swap only; remote schemes need a
    # transactional table format, so reject them before any read or write
    if "://" in path:
        raise NotImplementedError(
            "in-place compaction of non-local paths needs a transactional "
            "table format (Iceberg/Delta rewrite); got " + path
        )


def _swap_staged(spark, path: str, staging: str) -> None:
    """Promote a verified staging dir over the live layout with no window
    where ``path`` has NO live data: rename the old dir aside (atomic),
    rename staging into place (atomic), THEN delete the old copy. A crash
    between the renames leaves either the old or the new layout live at a
    recoverable sibling — never a half-deleted tree (the r9 advisor's
    rmtree-then-rename hole, whose delete window spanned a full recursive
    remove). Refreshes the session FileStatusCache for both dirs so a
    long-lived session's next read doesn't chase deleted part files."""
    import os
    import shutil

    old = path.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    try:
        os.rename(staging, path)
    except OSError:
        os.rename(old, path)  # roll back: old layout stays live
        raise
    shutil.rmtree(old)
    spark.catalog.refreshByPath(path)
    spark.catalog.refreshByPath(staging)


def _staged_compact(spark, path: str, reader, write_clustered) -> dict:
    _reject_remote_compaction(path)
    src = reader(spark, path)
    files_before = src.select(F.input_file_name()).distinct().count()
    n_src = src.count()
    staging = path.rstrip("/") + ".compacting"
    write_clustered(src, staging)
    dst = reader(spark, staging)
    n_dst = dst.count()
    if n_dst != n_src:
        raise RuntimeError(
            f"compaction row-count mismatch at {staging}: {n_dst} != {n_src}"
        )
    files_after = dst.select(F.input_file_name()).distinct().count()
    _swap_staged(spark, path, staging)
    return {
        "rows": n_src,
        "files_before": files_before,
        "files_after": files_after,
    }


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int | None = None) -> dict:
    """Recall@k of an approximate top-k result against exact ground truth —
    the QUALITY half of index maintenance (occupancy stats say whether the
    layout still partitions; recall says whether probes still FIND the
    neighbors, the number that degrades when an appended corpus drifts
    from a frozen quantizer or outgrows its plane count).

    Both inputs are ``(query_id, neighbor_id, ..., rank)`` frames — the
    shape every ``*_topk`` here returns; pass ``k`` to truncate both to
    their top ``k`` ranks first. Macro-averaged over queries (each query's
    hit fraction weighs equally), computed as one distributed
    semijoin-and-agg with a single scalar row collected — run it on a
    query SAMPLE at scale, never the full corpus (ground truth is a
    brute-force scan per query). Returns ``{"recall", "min_recall",
    "n_queries"}``."""
    if k is not None:
        approx = approx.filter(F.col("rank") <= k)
        exact = exact.filter(F.col("rank") <= k)
    truth = exact.select("query_id", "neighbor_id")
    hits = truth.join(
        approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi"
    )
    per_q = (
        truth.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_true"))
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")),
            "query_id",
            "left",
        )
        .select(
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_true")).alias("r")
        )
    )
    row = per_q.agg(
        F.avg("r").alias("recall"),
        F.min("r").alias("min_recall"),
        F.count(F.lit(1)).alias("n_queries"),
    ).collect()[0]
    return {
        "recall": round(float(row["recall"] or 0.0), 4),
        "min_recall": round(float(row["min_recall"] or 0.0), 4),
        "n_queries": int(row["n_queries"]),
    }


def holdout_filter(n: int, n_queries: int):
    """Deterministic held-out query sample: a ~``n_queries``-sized
    ``xxhash64 % mod == mod - 1`` slice — remainder ``mod - 1`` so it
    avoids the ``% sample_mod == 0`` slice the serving build pre-trains
    Lloyd on. Returns ``(mod, Column)``."""
    mod = max(2, n // max(1, n_queries))
    return mod, F.pmod(F.xxhash64(F.col("vec_id")), F.lit(mod)) == mod - 1


def measure_recall_curve(
    spark,
    path: str,
    k: int = 5,
    n_queries: int = 64,
    probes: list[int] | None = None,
) -> list[dict]:
    """Measured recall@k vs ``n_probe`` for an IVF index, on a HELD-OUT
    query sample (r11 verdict task 4, see ``holdout_filter``). Ground
    truth is one exact cosine pass over the sample. Returns the curve
    ``[{"n_probe", "recall", "min_recall", "scan_frac", "n_queries"}]``
    sorted by n_probe — store it in the ``_index_meta`` sidecar so a
    deployment resolves a probe budget FROM A TARGET RECALL
    (``resolve_n_probe``) instead of hand-tuning probes.

    Single-pass (r12): candidate pairs are scored ONCE at the max probe
    budget with the centroid rank (``c_rank``) kept, then every curve
    point filters ``c_rank <= p`` over the cached pairs — identical
    by construction to running ``ivf_topk`` per level (same window, same
    tie-breaks; the per-level equality is pinned in
    tests/test_ann_maintenance.py), but with ONE corpus join instead of
    len(probes). The max-probe point scans the whole corpus anyway, so
    the single pass costs what the old LAST iteration cost alone."""
    from pyspark.sql import Window as W

    corpus, cents = read_ivf_index(spark, path)
    n_cells = cents.count()
    spilled = "a_rank" in corpus.columns
    n = (
        corpus.filter(F.col("a_rank") == 1).count() if spilled else corpus.count()
    )
    if probes is None:
        probes = sorted(
            {p for p in (1, 2, 4, 8, 16, 32, 64, 128, 256) if p < n_cells}
            | {n_cells}
        )
    else:
        # normalize: the stored curve must be sorted and duplicate-free
        # whatever order the caller passed
        probes = sorted(set(probes))
    _, qf = holdout_filter(n, n_queries)
    primary = corpus.filter(F.col("a_rank") == 1) if spilled else corpus
    vectors = primary.select("vec_id", "embedding")
    exact = cosine_topk(vectors, k, query_filter=qf).localCheckpoint(
        eager=True
    )
    q_scored = _scored(primary.filter(qf).select("vec_id", "embedding"), cents)
    queries = (
        _best_cells(q_scored, max(probes))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("cid").alias("cell"),
            "c_rank",
        )
        .withColumn("q_nrm", _norm(F.col("q_emb")))
    )
    pairs = corpus.join(queries, ["cell"]).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _rd(
        _dot(F.col("q_emb"), F.col("embedding"))
        / (F.col("q_nrm") * F.col("nrm")),
        COS_ROUND,
    )
    scored_pairs = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cos.alias("cos"),
        "c_rank",
    )
    scored_pairs = scored_pairs.localCheckpoint(eager=True)
    nq = queries.select("query_id").distinct().count()
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    curve = []
    for p in probes:
        raw = scored_pairs.filter(F.col("c_rank") <= p)
        # MEASURED scan cost: rows actually SCORED per query over the corpus
        # size, counted BEFORE pair dedup (advisor r13 — the earlier
        # post-dedup count understated a spilled layout's true scan by up
        # to spill× at full probe). For single assignment this tracks
        # p/n_cells; for a spilled layout every reached copy is charged —
        # the stored curve is the budget a deployment actually pays.
        n_cand = raw.count()
        # a neighbor reached through two probed cells scores once for
        # RANKING (cos is identical across a pair's copies, so any copy
        # serves); filtering raw by c_rank first == the min-c_rank dedup
        cands = (
            raw.dropDuplicates(["query_id", "neighbor_id"])
            if spilled
            else raw
        )
        approx = (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
        r = recall_at_k(approx, exact)
        curve.append(
            {
                "n_probe": p,
                "recall": r["recall"],
                "min_recall": r["min_recall"],
                "scan_frac": round(p / n_cells, 4),
                "scan_frac_measured": round(n_cand / (max(1, nq) * n), 4),
                "n_queries": r["n_queries"],
            }
        )
    scored_pairs.unpersist()
    exact.unpersist()
    return curve


def store_recall_curve(spark, path: str, curve: list[dict]) -> None:
    """Merge the measured curve into the index's ``_index_meta`` sidecar."""
    meta = read_index_meta(spark, path) or {}
    meta["recall_curve"] = curve
    _write_index_meta(spark, path, meta)


def resolve_n_probe(curve: list[dict], target_recall: float) -> dict:
    """Smallest measured probe budget meeting ``target_recall``; if the
    whole curve falls short, the max-probe point with ``"unmet": True`` —
    callers surface that rather than silently serving below target."""
    if not curve:
        raise ValueError("empty recall curve — build with --target-recall "
                         "or run measure_recall_curve first")
    best = None
    for pt in sorted(curve, key=lambda d: d["n_probe"]):
        best = pt
        if pt["recall"] >= target_recall:
            return dict(pt)
    return {**best, "unmet": True}


def ann_lsh_topk(
    emb: DataFrame,
    k: int = 5,
    n_queries: int = N_QUERIES,
    n_bits: int = N_BITS,
    probe_radius: int = PROBE_RADIUS,
    bucketed: DataFrame | None = None,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: exact cosine restricted to multiprobed sign-LSH
    bucket candidates. The bucket join shuffles on 2^n_bits uniform keys.

    Pass ``bucketed=read_bucketized(...)`` to start from an ingest-time
    materialized corpus (``bucketize_corpus``): the plan then does ZERO
    plane-dot work — buckets and norms come straight off the parquet scan.
    On-the-fly (default) stays the oracle-gated shape.

    SCOPE (r9, measured): sign-LSH is the DEDUP CANDIDATE GENERATOR, not
    the ANN serving path. Near-duplicates (cos ~1) collide reliably, which
    is all dedup needs; top-k NEIGHBOR recall at serving-grade candidate
    budgets is weak on both replica corpora (PERF.md round-9
    recall-vs-budget table: 0.21-0.31 clumped / 0.04-0.13 decorrelated at
    <=0.2% of corpus scanned) — serve ANN from the IVF index
    (``ivf_topk``), whose ``n_probe`` knob buys recall smoothly
    (0.20->0.75 at 0.9->14% scanned on the realistic corpus).

    ``n_tables > 1`` ORs candidates across independent plane families (see
    ``bucket_col``) — the EFFICIENT recall lever when an LSH-only
    deployment must serve: matched-recall candidate volume is ~5x smaller
    than radius widening (L=8 at 136 probes == radius 3 at 697 probes on
    the realistic corpus). Candidates are generated from a
    column-pruned (vec_id, tagged-bucket) scan — tags offset table t's bucket
    by ``t * 2^n_bits`` so tables can't cross-match — deduped on the pair key
    (a neighbor found by several tables scores once), then scored via two
    broadcast joins back to the corpus. Costs one extra pruned corpus scan
    vs the single-table shape; the embedding column is never duplicated
    per-table."""
    from pyspark.sql import Window as W

    if n_tables < 1:
        raise ValueError(f"n_tables must be >= 1, got {n_tables}")
    n_probes_total = n_tables * len(_probe_masks(n_bits, probe_radius))
    if n_probes_total > _MAX_PROBES:
        raise ValueError(
            f"n_tables={n_tables} x radius-{probe_radius} probes = "
            f"{n_probes_total} per query (> {_MAX_PROBES})"
        )
    base = bucketed if bucketed is not None else _bucketed(emb, n_bits, n_tables)
    cos = _rd(
        _dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm")),
        COS_ROUND,
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    if n_tables == 1:
        q = base.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.explode(_probes(F.col("bucket"), n_bits, probe_radius)).alias(
                "probe"
            ),
        )
        pairs = base.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("probe"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        return (
            pairs.select(
                "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos")
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    base = _ensure_tables(base, n_bits, n_tables)
    names = _bucket_col_names(n_tables)
    span = 1 << n_bits
    # candidate generation over (vec_id, tag) only — column pruning keeps
    # the exploded corpus scan at ~L ints per vector, no embedding copies
    corpus_tags = base.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.col(c).cast("long") + F.lit(t * span)
                    for t, c in enumerate(names)
                ]
            )
        ).alias("tag"),
    )
    probe_exprs = []
    for t, c in enumerate(names):
        b = F.col(c).cast("int")
        for m in _probe_masks(n_bits, probe_radius):
            pb = b.bitwiseXOR(F.lit(m)) if m else b
            probe_exprs.append(pb.cast("long") + F.lit(t * span))
    q_tags = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.explode(F.array(*probe_exprs)).alias("tag"),
    )
    cand = (
        corpus_tags.join(F.broadcast(q_tags), "tag")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    n_side = base.select(
        F.col("vec_id").alias("neighbor_id"), "embedding", "nrm"
    )
    q_side = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = n_side.join(F.broadcast(cand), "neighbor_id").join(
        F.broadcast(q_side), "query_id"
    )
    return (
        pairs.select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_lsh_topk_sql(
    k: int = 5,
    n_queries: int = N_QUERIES,
    n_bits: int = N_BITS,
    probe_radius: int = PROBE_RADIUS,
    n_tables: int = 1,
) -> str:
    if n_tables == 1:
        return f"""
WITH bucketed AS (
    SELECT vec_id, embedding,
           {bucket_sql(n_bits)} AS bucket,
           {_NORM_SQL.format(a="embedding")} AS nrm
    FROM embeddings
),
q_probes AS (
    SELECT vec_id AS query_id, embedding AS q_emb, nrm AS q_nrm,
           unnest({_probes_sql(n_bits, probe_radius)}) AS probe
    FROM bucketed WHERE vec_id < {n_queries}
),
pairs AS (
    SELECT q.query_id, n.vec_id AS neighbor_id,
           (floor(({_DOT_SQL.format(a="q.q_emb", b="n.embedding")}
                 / (q.q_nrm * n.nrm)) * power(10.0, {COS_ROUND}) + 0.5) / power(10.0, {COS_ROUND})) AS cos
    FROM bucketed n JOIN q_probes q
      ON n.bucket = q.probe AND n.vec_id <> q.query_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
"""
    # multi-table OR-amplification twin: same tagged-candidate construction
    # as the Spark path (table t's bucket offset by t*2^n_bits, DISTINCT on
    # the pair key, score once)
    names = _bucket_col_names(n_tables)
    span = 1 << n_bits
    bucket_exprs = ",\n           ".join(
        f"{bucket_sql(n_bits, table=t)} AS {name}"
        for t, name in enumerate(names)
    )
    corpus_tags = ", ".join(
        f"CAST({name} AS BIGINT) + {t * span}" for t, name in enumerate(names)
    )
    probe_tags = ", ".join(
        (
            f"CAST(xor({name}, {m}) AS BIGINT) + {t * span}"
            if m
            else f"CAST({name} AS BIGINT) + {t * span}"
        )
        for t, name in enumerate(names)
        for m in _probe_masks(n_bits, probe_radius)
    )
    return f"""
WITH bucketed AS (
    SELECT vec_id, embedding,
           {bucket_exprs},
           {_NORM_SQL.format(a="embedding")} AS nrm
    FROM embeddings
),
corpus_tags AS (
    SELECT vec_id, unnest([{corpus_tags}]) AS tag FROM bucketed
),
q_tags AS (
    SELECT vec_id AS query_id, unnest([{probe_tags}]) AS tag
    FROM bucketed WHERE vec_id < {n_queries}
),
cand AS (
    SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
    FROM corpus_tags c JOIN q_tags q
      ON c.tag = q.tag AND c.vec_id <> q.query_id
),
pairs AS (
    SELECT cand.query_id, cand.neighbor_id,
           (floor(({_DOT_SQL.format(a="q.embedding", b="n.embedding")}
                 / (q.nrm * n.nrm)) * power(10.0, {COS_ROUND}) + 0.5) / power(10.0, {COS_ROUND})) AS cos
    FROM cand
    JOIN bucketed n ON n.vec_id = cand.neighbor_id
    JOIN bucketed q ON q.vec_id = cand.query_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
"""


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    n_bits: int = N_BITS,
    probe_radius: int = PROBE_RADIUS,
    salt_cap: int = SALT_CAP,
    bucketed: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within multiprobed LSH buckets
    (scale path: candidate generation is bucket-local, never O(n^2)). The
    probe expansion runs on ONE side of the self-join, so each candidate pair
    appears exactly once.

    The bucket join's parallelism is PINNED with an explicit keyed
    repartition on both sides: AQE sizes the join's shuffle from the
    map-side bytes (two small bucketed vector frames) and coalesces it to a
    couple of partitions, but the join FANS OUT to every intra-bucket
    candidate pair and each output row pays a dim-length dot-product fold —
    the r6 sf1 sweep measured a single straggler task grinding ~all of a
    2M-pair graph for minutes while 31 cores idled. An explicit
    numPartitions repartition is exempt from AQE coalescing, so the
    candidate generation and the cos() folds spread across the full
    cluster.

    Pinning alone assumes near-uniform bucket sizes — true for sign-LSH
    over well-spread vectors, FALSE for real corpora, where boilerplate /
    template embeddings pile thousands of near-identical vectors into a few
    mega-buckets (the r7 sf10 replica measured a 5,543-vector bucket
    against a median of 3; one task then owns that bucket's ~C(k,2)
    candidate volume and grinds for hours while 31 cores idle — AQE's skew
    splitter can't help, because the skew EXPLODES AT THE JOIN, downstream
    of the shuffle it rebalances). The join is therefore SALTED adaptively:
    a broadcast bucket histogram assigns each bucket ceil(count/salt_cap)
    slices; the vector side hashes into a slice, the probe side replicates
    each probe across the target bucket's slice range. Per-task candidate
    work is bounded by ~salt_cap * |bucket| regardless of skew, normal
    buckets keep exactly one slice (zero replication), and — because the
    probe side inner-joins the histogram — probes into EMPTY buckets drop
    before the shuffle (at 16 bits most single-bit flips land nowhere).
    Output rows are identical to the unsalted join: each (a, b) pair
    carries exactly one b-side slice.

    ``base`` feeds THREE plans (the bucket histogram, the b side, the a
    side); computed on the fly, the n_bits plane-dot folds would run over
    the full corpus three times, so the frame is persisted — first
    materialization fills the cache, the other two scans reuse it (Spark's
    CacheManager keys on the logical plan). With ``bucketed=`` (an
    ingest-time ``bucketize_corpus`` read) there is no plane-dot work to
    amortize and the parquet scan stays uncached. The persisted frame has
    no release point inside this function (the returned pairs are lazy);
    a long-lived driver calling this repeatedly should
    ``spark.catalog.clearCache()`` between calls — registry/driver runs
    are per-session, and the ingest job already clears per batch."""
    base = bucketed if bucketed is not None else _bucketed(emb, n_bits).persist()
    n_part = int(
        base.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    slices = base.groupBy("bucket").agg(
        F.ceil(F.count(F.lit(1)) / F.lit(salt_cap)).cast("int").alias("n_slices")
    )
    b = (
        base.join(F.broadcast(slices), "bucket")
        .withColumn("slice", F.pmod(F.hash("vec_id"), F.col("n_slices")))
        .drop("n_slices")
        .repartition(n_part, F.col("bucket"), F.col("slice"))
    )
    a = (
        base.select(
            F.col("vec_id").alias("id_a"),
            F.col("embedding").alias("emb_a"),
            F.col("nrm").alias("nrm_a"),
            F.explode(_probes(F.col("bucket"), n_bits, probe_radius)).alias("probe"),
        )
        .join(
            F.broadcast(slices.withColumnRenamed("bucket", "probe")), "probe"
        )
        .withColumn(
            "a_slice", F.explode(F.sequence(F.lit(0), F.col("n_slices") - 1))
        )
        .drop("n_slices")
        .repartition(n_part, F.col("probe"), F.col("a_slice"))
    )
    pairs = b.join(
        a,
        (F.col("bucket") == F.col("probe"))
        & (F.col("slice") == F.col("a_slice"))
        & (F.col("id_a") < F.col("vec_id")),
    )
    cos = _rd(
        _dot(F.col("emb_a"), F.col("embedding")) / (F.col("nrm_a") * F.col("nrm")),
        COS_ROUND,
    )
    return pairs.select(
        F.col("id_a").alias("doc_a"),
        F.col("vec_id").alias("doc_b"),
        cos.alias("cos"),
    ).filter(F.col("cos") >= threshold)


def _neardup_base_ctes(n_bits: int, probe_radius: int) -> str:
    return f"""bucketed AS (
    SELECT vec_id, embedding,
           {bucket_sql(n_bits)} AS bucket,
           {_NORM_SQL.format(a="embedding")} AS nrm
    FROM embeddings
),
a_probes AS (
    SELECT vec_id AS id_a, embedding AS emb_a, nrm AS nrm_a,
           unnest({_probes_sql(n_bits, probe_radius)}) AS probe
    FROM bucketed
),
pairs AS (
    SELECT a.id_a AS doc_a, b.vec_id AS doc_b,
           (floor(({_DOT_SQL.format(a="a.emb_a", b="b.embedding")}
                 / (a.nrm_a * b.nrm)) * power(10.0, {COS_ROUND}) + 0.5) / power(10.0, {COS_ROUND})) AS cos
    FROM bucketed b JOIN a_probes a
      ON b.bucket = a.probe AND a.id_a < b.vec_id
)"""


def embedding_neardup_sql(
    threshold: float = 0.9,
    n_bits: int = N_BITS,
    probe_radius: int = PROBE_RADIUS,
) -> str:
    return f"""
WITH {_neardup_base_ctes(n_bits, probe_radius)}
SELECT doc_a, doc_b, cos FROM pairs WHERE cos >= {threshold}
"""


def neardup_ctes_sql(
    threshold: float = 0.9,
    n_bits: int = N_BITS,
    probe_radius: int = PROBE_RADIUS,
) -> str:
    """CTE chain ending in ``neardup_pairs`` (doc_a, doc_b) — composable into
    downstream oracles (connected components over the embedding pair graph)."""
    return f"""{_neardup_base_ctes(n_bits, probe_radius)},
neardup_pairs AS (
    SELECT doc_a, doc_b FROM pairs WHERE cos >= {threshold}
)"""


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN with unrolled-Lloyd k-means centroids
# ---------------------------------------------------------------------------


def _scored(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Cosine of every vector against every centroid (centroids broadcast).

    Norms are projected per SIDE below the join, not inside the post-join
    cosine expression: HOF folds are interpreted (CodegenFallback), so a
    ``_norm`` written into the pair projection pays n x n_cells folds
    where n + n_cells suffice — at 200k x 448 the r9 probe measured the
    difference as 127.8 s vs 4.1 s for one TRUE scoring pass (earlier
    timings that looked fine were count()-pruned illusions: count over
    the downstream aggregate never evaluates c_cos). The emb side also
    gets a repartition floor, because the heavy interpreted map runs ON
    THE SCAN side of the broadcast join and a 13-split parquet read was
    serving 32 cores. The floor only engages when the input has fewer
    partitions than the session default — at real scale the scan's split
    planning already provides parallelism and no extra shuffle is paid."""
    cents = centroids
    if "c_nrm" not in cents.columns:
        cents = cents.select(
            "cid", "c_emb", _norm(F.col("c_emb")).alias("c_nrm")
        )
    e = emb.select(
        "vec_id",
        "embedding",
        (
            F.col("nrm") if "nrm" in emb.columns else _norm(F.col("embedding"))
        ).alias("_e_nrm"),
    )
    sc = emb.sparkSession.sparkContext
    if e.rdd.getNumPartitions() < sc.defaultParallelism:
        e = e.repartition(sc.defaultParallelism)
    return e.join(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "cid",
        _rd(
            _dot(F.col("embedding"), F.col("c_emb"))
            / (F.col("_e_nrm") * F.col("c_nrm")),
            COS_ROUND,
        ).alias("c_cos"),
    )


def _best_cells(scored: DataFrame, n_best: int) -> DataFrame:
    from pyspark.sql import Window as W

    if n_best == 1:
        # argmax via max_by: the n_best=1 case is the FULL-CORPUS cell
        # assignment (run once per Lloyd iteration and once at layout
        # write), i.e. n x n_cells rows — a row_number window there is a
        # global sort of the entire scored cross frame (89.6M rows at
        # 200k x 448), where max_by is one partial-aggregatable groupBy
        # with map-side combine. Tie-break matches the window's
        # (c_cos DESC, cid ASC): max over (c_cos, -cid).
        return (
            scored.groupBy("vec_id")
            .agg(
                F.max_by(
                    F.struct("cid", "embedding", "c_cos"),
                    F.struct(F.col("c_cos"), -F.col("cid")),
                ).alias("_b")
            )
            .select(
                "vec_id",
                F.col("_b.embedding").alias("embedding"),
                F.col("_b.cid").alias("cid"),
                F.col("_b.c_cos").alias("c_cos"),
                F.lit(1).alias("c_rank"),
            )
        )
    w = W.partitionBy("vec_id").orderBy(F.col("c_cos").desc(), F.col("cid"))
    return scored.withColumn("c_rank", F.row_number().over(w)).filter(
        F.col("c_rank") <= n_best
    )


def kmeans_centroids(
    emb: DataFrame, n_cells: int = IVF_CELLS, n_iters: int = IVF_ITERS
) -> DataFrame:
    """Spherical k-means centroids: stratified deterministic seeds (every
    ``n // n_cells``-th vec_id — spread across the corpus, unlike the round-1
    first-k choice) refined by ``n_iters`` Lloyd steps. Each step is one
    broadcast score + one explode/groupBy mean — fully distributed, and the
    centroid count stays broadcast-small. Components round to 6 decimals so
    the DuckDB twin (same unrolled iterations) lands on identical cells.

    The driver-side ``count()`` is a scalar pre-count for the seed stride —
    the same envelope-scale pattern as the export pre-count (A4).
    """
    from pyspark.sql import Window as W

    n = emb.count()
    stride = max(1, n // n_cells)
    cents = (
        emb.filter((F.col("vec_id") % stride) == 0)
        .orderBy("vec_id")
        .limit(n_cells)
        .select(
            F.row_number().over(W.orderBy("vec_id")).alias("cid"),
            F.col("embedding").alias("c_emb"),
        )
    )
    for _ in range(n_iters):
        assign = _best_cells(_scored(emb, cents), 1)
        exploded = assign.select("cid", F.posexplode("embedding").alias("j", "x"))
        means = exploded.groupBy("cid", "j").agg(
            _rd(F.avg(F.col("x").cast("double")), COS_ROUND).alias("m")
        )
        cents = means.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "m"))), lambda s: s["m"]
            ).alias("c_emb")
        )
        # Materialize each step (a centroid-count-sized frame): without
        # this, iteration k's plan CONTAINS iterations 1..k-1 — every
        # broadcast re-executes the whole chain (quadratic in n_iters) —
        # and worse, a downstream single-partition write (the r9
        # coalesce(1) centroid write at sqrt-n cells) collapses the entire
        # Lloyd lineage, including the n x n_cells assignment window, into
        # ONE task: measured 30+ min single-threaded at 200k x 448 vs ~2
        # min parallel. Values are identical — this is execution shape
        # only, so the DuckDB unrolled twin is unaffected.
        cents = cents.localCheckpoint(eager=True)
    return cents


def _assign_corpus(emb: DataFrame, cents: DataFrame, spill: int = 1) -> DataFrame:
    """Cell-assign a corpus under ``cents``. ``spill=1`` is the classic IVF
    single assignment (schema ``vec_id, embedding, cell, nrm`` — unchanged).
    ``spill>1`` stores each vector in its top-``spill`` cells with the
    assignment rank kept as ``a_rank`` — the boundary-loss fix measured on
    the realistic sf10 corpus (PERF.md round-13): recall misses are
    dominated by true neighbors sitting just across a Voronoi boundary
    from the query's probed cells, and storing the neighbor in 2-3 cells
    converts those misses into hits at the SAME probe budget. Storage and
    scan cost scale ~``spill``-fold; the measured frontier (2048 cells,
    spill 3) paid 7.6% scanned for recall@5 0.753 where single assignment
    paid 13.0% for 0.747."""
    assigned = _best_cells(_scored(emb, cents), spill)
    out = assigned.select(
        "vec_id", "embedding", F.col("cid").alias("cell"), "c_rank"
    ).withColumn("nrm", _norm(F.col("embedding")))
    if spill > 1:
        return out.withColumnRenamed("c_rank", "a_rank")
    return out.drop("c_rank")


def build_ivf_index(
    emb: DataFrame,
    path: str,
    n_cells: int = IVF_CELLS,
    n_iters: int = IVF_ITERS,
    n_files: int | None = None,
    centroids: DataFrame | None = None,
    spill: int = 1,
) -> None:
    """Ingest-time IVF index — the write-once twin of ``bucketize_corpus``
    for the k-means path. At 100 TB the coarse quantizer trains ONCE at
    ingest (the Lloyd iterations are full-corpus scans) and the corpus is
    laid out cell-clustered; a query then probes ``n_probe`` cells without
    re-running k-means or re-scoring the corpus. Writes two parquets under
    ``path``: ``centroids/`` (broadcast-small, one file) and ``corpus/``
    ``(vec_id, embedding, cell, nrm)`` hash-clustered and sorted by cell so
    row-group stats prune unprobed cells at scan time.

    Pass ``centroids=`` to reuse a pretrained quantizer instead of running
    Lloyd here — the scale pattern for periodic re-layout (train once on a
    sample or an earlier snapshot, lay out many corpus slices under the
    SAME cells so their indexes are mergeable) and the rebuild-equality
    anchor for ``append_to_ivf_index``."""
    cents = (
        centroids
        if centroids is not None
        else kmeans_centroids(emb, n_cells, n_iters)
    )
    cents.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    cents = emb.sparkSession.read.parquet(f"{path}/centroids")
    corpus = _assign_corpus(emb, cents, spill)
    corpus = (
        corpus.repartition(n_files, F.col("cell"))
        if n_files is not None
        else corpus.repartition(F.col("cell"))
    )
    corpus.sortWithinPartitions("cell").write.mode("overwrite").parquet(
        f"{path}/corpus"
    )
    # sidecar lets maintenance verbs identify the layout without probing
    _write_index_meta(
        emb.sparkSession,
        path,
        {"kind": "ivf", "n_cells": n_cells, "spill": spill},
    )


def read_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Read a ``build_ivf_index`` output as ``(corpus, centroids)`` —
    accepted by ``ivf_topk`` via ``index=`` so queries skip quantizer
    training and corpus scoring entirely."""
    return (
        spark.read.option("recursiveFileLookup", "true").parquet(
            f"{path}/corpus"
        ),
        spark.read.parquet(f"{path}/centroids"),
    )


def append_to_ivf_index(
    emb_delta: DataFrame,
    path: str,
    n_files: int | None = None,
    subdir: str | None = None,
) -> None:
    """Delta ingest for a ``build_ivf_index`` layout: assign the delta to its
    nearest cell under the index's FROZEN centroids (read back from the
    index — one broadcast score over the delta only, no Lloyd, no touch of
    the existing corpus) and append cell-clustered. Identical by
    construction to what ``build_ivf_index(full, centroids=same)`` would
    have produced for those rows, which is the equality the test pins.

    The quantizer staying frozen is the point (appends under moved
    centroids would strand earlier rows in stale cells), and its cost is
    drift: a corpus whose distribution moves away from the training
    snapshot skews the cell histogram and degrades probe recall — watch
    ``ivf_index_stats()['skew']`` and retrain via a fresh
    ``build_ivf_index`` when it climbs."""
    spark = emb_delta.sparkSession
    cents = spark.read.parquet(f"{path}/centroids")
    # same spill as the index was built with (sidecar), so appended rows
    # are laid out exactly as a from-scratch rebuild would place them
    spill = int((read_index_meta(spark, path) or {}).get("spill", 1))
    delta = _assign_corpus(emb_delta, cents, spill)
    delta = (
        delta.repartition(n_files, F.col("cell"))
        if n_files is not None
        else delta.repartition(F.col("cell"))
    )
    if subdir is not None:
        # replay-idempotent epoch-keyed overwrite (see append_to_bucketized)
        delta.sortWithinPartitions("cell").write.mode("overwrite").parquet(
            f"{path}/corpus/{subdir}"
        )
        return
    delta.sortWithinPartitions("cell").write.mode("append").parquet(
        f"{path}/corpus"
    )


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    n_queries: int = N_QUERIES,
    n_cells: int = IVF_CELLS,
    n_probe: int = IVF_PROBE,
    n_iters: int = IVF_ITERS,
    index: tuple[DataFrame, DataFrame] | None = None,
    query_filter=None,
    spill: int = 1,
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer, corpus sharded by
    nearest cell, queries probe their ``n_probe`` nearest cells, exact cosine
    within probed cells only.

    At scale this is the classic IVF layout: the corpus partitions by cell id
    (each cell a shard), queries fan out to n_probe shards — candidate count
    is ~n_probe/n_cells of the corpus. With the default single assignment a
    corpus vector lives in exactly one cell, so no candidate dedup is
    needed; ``spill > 1`` (on-the-fly twin of ``build_ivf_index(spill=)``)
    stores each vector in its top-``spill`` cells and dedups candidates —
    the measured recall-per-scanned-row winner on the realistic sf10
    corpus (PERF.md round-13). An ``index=`` whose layout carries
    ``a_rank`` spills implicitly; the ``spill`` argument is for the
    on-the-fly path and must be left at 1 when ``index`` is given.

    Serving-shape guidance (r10 sweep on the realistic sf10 replica, grid
    in PERF.md): size ``n_cells ~ 2-5x sqrt(n)`` and train with ``n_iters
    ~ 6`` on a hash sample — recall@5 at a fixed 5%-scanned budget went
    0.48 (sqrt-n cells, 2 iters) -> 0.58 (1024 cells, 6 iters) on 200k
    vectors; training quality bought as much as cell count. The module
    defaults (IVF_CELLS/IVF_ITERS) stay small for the DuckDB-unrolled
    oracle pin, not for serving.

    Pass ``index=read_ivf_index(...)`` to start from an ingest-time
    materialized index: no Lloyd iterations, no corpus re-scoring — only
    the ``n_queries`` vectors are scored against the (broadcast) centroids.
    On-the-fly (default) stays the oracle-gated shape.
    """
    from pyspark.sql import Window as W

    qf = query_filter if query_filter is not None else (
        F.col("vec_id") < n_queries
    )
    if index is not None:
        if spill != 1:
            raise ValueError(
                "spill= applies to the on-the-fly path only; an index= "
                "layout carries its own spill (the a_rank column)"
            )
        corpus, cents = index
        if "a_rank" in corpus.columns:
            # spilled layout: each vector appears in `spill` cells — the
            # query SIDE wants it once
            q_vecs = corpus.filter(qf).filter(F.col("a_rank") == 1).select(
                "vec_id", "embedding"
            )
        else:
            q_vecs = corpus.filter(qf).select("vec_id", "embedding")
        q_scored = _scored(q_vecs, cents)
    else:
        cents = kmeans_centroids(emb, n_cells, n_iters)
        scored = _scored(emb, cents)
        corpus = (
            _best_cells(scored, 1)
            .select("vec_id", "embedding", F.col("cid").alias("cell"))
            .withColumn("nrm", _norm(F.col("embedding")))
            if spill == 1
            else _assign_corpus(emb, cents, spill)
        )
        q_scored = scored.filter(qf)
    queries = (
        _best_cells(q_scored, n_probe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("cid").alias("cell"),
        )
        .withColumn("q_nrm", _norm(F.col("q_emb")))
    )
    pairs = corpus.join(queries, ["cell"]).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _rd(
        _dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm")),
        COS_ROUND,
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    cand = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos")
    )
    if "a_rank" in corpus.columns:
        # spilled layout (see _assign_corpus): a vector living in two
        # probed cells yields duplicate candidate rows with identical cos —
        # dedup before ranking so top-k never counts a neighbor twice.
        # Gated on the column so the single-assignment (oracle-pinned)
        # plan is byte-unchanged.
        cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _kmeans_sql(n_cells: int, n_iters: int) -> str:
    """CTE chain computing cent{n_iters} — the unrolled Lloyd twin."""
    ctes = [
        f"""seeds AS (
    SELECT vec_id, embedding FROM embeddings
    WHERE vec_id % (SELECT GREATEST(1, COUNT(*) // {n_cells}) FROM embeddings) = 0
    ORDER BY vec_id LIMIT {n_cells}
),
cent0 AS (
    SELECT row_number() OVER (ORDER BY vec_id) AS cid, embedding AS c_emb
    FROM seeds
)"""
    ]
    for t in range(n_iters):
        ctes.append(
            f"""scored{t} AS (
    SELECT e.vec_id, e.embedding, c.cid,
           (floor(({_DOT_SQL.format(a="e.embedding", b="c.c_emb")}
                 / ({_NORM_SQL.format(a="e.embedding")}
                    * {_NORM_SQL.format(a="c.c_emb")})) * power(10.0, {COS_ROUND}) + 0.5) / power(10.0, {COS_ROUND})) AS c_cos
    FROM embeddings e, cent{t} c
),
assign{t} AS (
    SELECT vec_id, embedding, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY c_cos DESC, cid) AS rn
        FROM scored{t}
    ) WHERE rn = 1
),
cent{t + 1} AS (
    SELECT cid, list(m ORDER BY j) AS c_emb FROM (
        SELECT cid, j, (floor((avg(CAST(x AS DOUBLE))) * power(10.0, {COS_ROUND}) + 0.5) / power(10.0, {COS_ROUND})) AS m FROM (
            SELECT cid, unnest(embedding) AS x,
                   unnest(generate_series(1, len(embedding))) AS j
            FROM assign{t}
        ) GROUP BY cid, j
    ) GROUP BY cid
)"""
        )
    return ",\n".join(ctes)


def ivf_topk_sql(
    k: int = 5,
    n_queries: int = N_QUERIES,
    n_cells: int = IVF_CELLS,
    n_probe: int = IVF_PROBE,
    n_iters: int = IVF_ITERS,
    spill: int = 1,
) -> str:
    """DuckDB twin of ``ivf_topk``; ``spill`` mirrors the corpus
    multi-assignment (corpus keeps c_rank <= spill, pairs dedup on the
    pair key — cos is identical across a pair's copies, so SELECT
    DISTINCT is exact)."""
    return f"""
WITH {_kmeans_sql(n_cells, n_iters)},
scored_final AS (
    SELECT e.vec_id, e.embedding, c.cid,
           (floor(({_DOT_SQL.format(a="e.embedding", b="c.c_emb")}
                 / ({_NORM_SQL.format(a="e.embedding")}
                    * {_NORM_SQL.format(a="c.c_emb")})) * power(10.0, {COS_ROUND}) + 0.5) / power(10.0, {COS_ROUND})) AS c_cos,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY (floor(({_DOT_SQL.format(a="e.embedding", b="c.c_emb")}
                                             / ({_NORM_SQL.format(a="e.embedding")}
                                                * {_NORM_SQL.format(a="c.c_emb")})) * power(10.0, {COS_ROUND}) + 0.5) / power(10.0, {COS_ROUND})) DESC,
                                       c.cid) AS c_rank
    FROM embeddings e, cent{n_iters} c
),
corpus AS (
    SELECT vec_id, embedding, cid AS cell,
           {_NORM_SQL.format(a="embedding")} AS nrm
    FROM scored_final WHERE c_rank <= {spill}
),
queries AS (
    SELECT vec_id AS query_id, embedding AS q_emb, cid AS cell,
           {_NORM_SQL.format(a="embedding")} AS q_nrm
    FROM scored_final WHERE c_rank <= {n_probe} AND vec_id < {n_queries}
),
pairs AS (
    SELECT {"DISTINCT " if spill > 1 else ""}q.query_id, n.vec_id AS neighbor_id,
           (floor(({_DOT_SQL.format(a="q.q_emb", b="n.embedding")}
                 / (q.q_nrm * n.nrm)) * power(10.0, {COS_ROUND}) + 0.5) / power(10.0, {COS_ROUND})) AS cos
    FROM corpus n JOIN queries q ON n.cell = q.cell AND n.vec_id <> q.query_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
"""


def scan_delta_neardup(
    emb_delta: DataFrame,
    path: str,
    threshold: float = 0.9,
    probe_radius: int = PROBE_RADIUS,
    exclude_file_substr: str | None = None,
) -> DataFrame:
    """Flag delta vectors near-duplicating the INDEXED corpus — the
    embedding analog of ``dedup_index.scan_delta``, for an ingester that
    suppresses near-duplicate embeddings before appending them.

    Candidates come from multiprobing the DELTA side's buckets (radius
    ``probe_radius``) against the materialized ``bucketize_corpus`` layout;
    the delta side is ``broadcast()`` so the index side never shuffles, and
    per-task work is one index partition x the (small) broadcast delta —
    an index mega-bucket spreads across its own partitions, so the
    self-join's salting machinery is unnecessary here. Exact cosine on
    candidates only.

    ``exclude_file_substr`` drops index files whose path contains the
    substring (a replaying streaming batch passes its own ``/delta-e<N>/``
    so a crash after its append cannot flag its survivors against
    themselves). Output: ``(vec_id, match_id, cos)`` — the best (highest
    cosine, lowest id) indexed near-dup per flagged delta vector."""
    spark = emb_delta.sparkSession
    meta = read_index_meta(spark, path)
    if not meta or meta.get("n_bits") is None:
        raise ValueError(
            f"index at {path} has no n_bits sidecar; build it with "
            "bucketize_corpus before scanning deltas against it"
        )
    n_bits = meta["n_bits"]
    idx = read_bucketized(spark, path)
    if exclude_file_substr:
        # input_file_name must be read BEFORE the select in read_bucketized
        # narrows columns... it survives projection, so filter here is fine
        idx = (
            idx.withColumn("_f", F.input_file_name())
            .filter(~F.col("_f").contains(exclude_file_substr))
            .drop("_f")
        )
    d = _bucketed(emb_delta, n_bits)
    probes = d.select(
        F.col("vec_id").alias("d_id"),
        F.col("embedding").alias("d_emb"),
        F.col("nrm").alias("d_nrm"),
        F.explode(_probes(F.col("bucket"), n_bits, probe_radius)).alias(
            "bucket"
        ),
    )
    cos = _rd(
        _dot(F.col("d_emb"), F.col("embedding"))
        / (F.col("d_nrm") * F.col("nrm")),
        COS_ROUND,
    )
    scored = (
        idx.join(F.broadcast(probes), "bucket")
        .filter(F.col("vec_id") != F.col("d_id"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
    )
    from pyspark.sql import Window as W

    best = W.partitionBy("d_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(best))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("d_id").alias("vec_id"),
            F.col("vec_id").alias("match_id"),
            "cos",
        )
    )
