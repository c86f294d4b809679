"""Temporal joins Spark's DataFrame API lacks, expressed scale-first.

**As-of join** (each left row matched to the right row with the greatest
timestamp at-or-before its own, per key): the naive formulation is an
inequality join — O(|L|x|R|) pairs per key before the argmax — which Spark
plans as a broadcast-nested-loop or a range-exploded sort-merge. The
scalable shape used here is the classic union trick:

    union(left, right) tagged by side
      -> ONE shuffle on the key
      -> running ``last(struct(*values), ignorenulls=True)`` window ordered
         by (ts, side) within the key (one struct so NULL right values
         survive and all columns fill from the SAME matched row)
      -> keep the left rows, now carrying the most recent right payload.

Cost is one exchange + one sort — linear in |L|+|R|, no pair explosion, and
AQE handles key skew like any other keyed window. Right rows must be unique
per (key, ts) (pre-aggregate to that grain) so ties are deterministic.

The DuckDB oracle uses its native ``ASOF LEFT JOIN`` — an independent
implementation of the same semantics, which is exactly what the hash gate
should compare against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_col: str,
    end_col: str,
    granularity_s: int,
) -> DataFrame:
    """Containment join (point_ts in [start, end] per key) using only
    equi-joins: time is cut into ``granularity_s`` cells, each interval
    explodes over the cells it covers, points join on (key, cell), and the
    exact bounds refine the candidates. A point occupies exactly one cell, so
    each (point, interval) pair matches at most once — no dedup.

    Precondition: if the timestamp columns are TIMESTAMP_NTZ, the session
    timezone must be UTC for the ``cast("timestamp")`` below to be
    value-stable (the engine's sessions pin it; arbitrary callers must too).

    Scale story: Spark plans a raw inequality join as broadcast-nested-loop
    (pair explosion); this shape is one shuffled equi-join with explode
    factor ``interval_len/granularity + 1`` — pick granularity on the order
    of the max interval length for a ~2-3x row expansion on the (usually
    much smaller) interval side only.
    """
    # cast tolerates TIMESTAMP_NTZ parquet columns (session tz is pinned UTC,
    # so NTZ->TIMESTAMP is value-stable and a no-op for TIMESTAMP inputs).
    # ENFORCE the precondition instead of assuming it: a caller-provided
    # session with a non-UTC timezone would silently shift every NTZ value
    # during the cast, so fail loudly — but only when an NTZ column is
    # actually involved (TIMESTAMP inputs are timezone-independent here).
    ntz_cols = [
        (name, c)
        for df, cols in ((points, [point_ts]), (intervals, [start_col, end_col]))
        for name, c in ((dict(df.dtypes).get(c), c) for c in cols)
        if name == "timestamp_ntz"
    ]
    if ntz_cols:
        tz = points.sparkSession.conf.get("spark.sql.session.timeZone", "")
        if tz != "UTC":
            raise ValueError(
                f"interval_join_bucketed: TIMESTAMP_NTZ column(s) "
                f"{[c for _, c in ntz_cols]} require session timezone UTC "
                f"for a value-stable cast, but spark.sql.session.timeZone="
                f"{tz!r}; set it to 'UTC' (get_spark pins it)"
            )
    cell = lambda c: F.floor(
        F.unix_micros(F.col(c).cast("timestamp")) / (granularity_s * 1_000_000)
    )
    pb = points.withColumn("_cell", cell(point_ts))
    ib = intervals.withColumn(
        "_cell", F.explode(F.sequence(cell(start_col), cell(end_col)))
    )
    return (
        pb.join(ib, [key, "_cell"])
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("_cell")
    )


BLOOM_M = 1 << 20  # filter bits; sized ~10x expected build keys
BLOOM_K = 2  # hash functions


def _bloom_pos(c, seed: int, m: int):
    return F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(m))


def bloom_semi_filter(
    probe: DataFrame,
    build_keys: DataFrame,
    build_col: str,
    probe_col: str,
    m: int = BLOOM_M,
) -> DataFrame:
    """Bloom-style runtime row pruning for selective joins, in pure Column
    expressions (Spark's own ``bloom_filter_agg`` powers InjectRuntimeFilter
    but is not SQL/DataFrame-exposed): the build side's keys hash into k of
    m bit positions; the bitmask — packed into m/64 longs, a BOUNDED
    broadcast (m=2^20 -> 128 KiB) no matter how many keys — broadcasts to
    the probe side, which keeps only rows whose k bits are all set.

    The probe is O(1) per row: ``element_at`` on the word array is a direct
    index (GetArrayItem), then shift+mask. (An earlier occupied-position-set
    formulation probed via ``array_contains`` — a LINEAR scan of up to m
    values per row, ~100x slower on a 600k-row probe side.)

    May pass false positives, NEVER false negatives — so following with the
    exact join keeps results exact while the shuffle/scan downstream sees
    only candidate rows. At 100 TB this is the difference between shuffling
    the full fact table and shuffling the matching slice.
    """
    n_words = (m + 63) // 64
    # xxhash64 is input-TYPE-sensitive: int(1) and bigint(1) hash differently,
    # which would silently violate the never-false-negative contract when the
    # build and probe key types differ. Hash a STRING render on both sides so
    # equal values always hash equal regardless of declared width.
    pos = F.explode(
        F.array(
            *[
                _bloom_pos(F.col(build_col).cast("string"), s, m)
                for s in range(BLOOM_K)
            ]
        )
    ).alias("_pos")
    # bit_or partials combine map-side; the zero filler guarantees every word
    # index exists, so the collected array is dense and positional.
    filler = build_keys.sparkSession.range(n_words).select(
        F.col("id").cast("int").alias("_w"), F.lit(0).cast("long").alias("_b")
    )
    words = (
        build_keys.select(pos)
        .select(
            (F.col("_pos") / 64).cast("int").alias("_w"),
            F.expr("shiftleft(1L, CAST(_pos % 64 AS INT))").alias("_b"),
        )
        .union(filler)
        .groupBy("_w")
        .agg(F.bit_or("_b").alias("_bits"))
    )
    # one row: dense word array (index = word, O(1) element access on probe)
    mask = words.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("_w", "_bits"))),
            lambda x: x["_bits"],
        ).alias("_bloom")
    )

    def _hit(s: int):
        probe_key = f"CAST({probe_col} AS STRING)"
        return F.expr(
            f"(shiftright(element_at(_bloom, CAST(pmod(xxhash64({probe_key},"
            f" {s}), {m}) / 64 AS INT) + 1),"
            f" CAST(pmod(xxhash64({probe_key}, {s}), {m}) % 64 AS INT))"
            f" & 1L) = 1L"
        )

    pred = None
    for s in range(BLOOM_K):
        h = _hit(s)
        pred = h if pred is None else (pred & h)
    return probe.join(F.broadcast(mask)).filter(pred).drop("_bloom")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: attach to every left row the ``value_cols`` of the
    right row with the greatest ``right_ts`` <= ``left_ts`` (``<`` when
    ``strict``) for the same ``key``. Right rows must be unique per
    (key, right_ts). Unmatched left rows keep nulls (LEFT semantics).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import types as T

    left_cols = left.columns
    # side tag orders a right row BEFORE left rows at the same instant for
    # inclusive (<=) semantics, AFTER them for strict (<)
    r_side, l_side = (1, 0) if strict else (0, 1)
    # All value_cols ride in ONE struct: last(struct, ignorenulls) then picks
    # whole matched rows. Filling each column independently would skip a right
    # row whose value is legitimately NULL and carry a STALE earlier value
    # forward — worse, different columns could fill from different right rows,
    # yielding a composite that never existed. The struct itself is non-null
    # for every right row, so the matched row's own NULLs survive (DuckDB
    # ASOF parity).
    vals_type = T.StructType([right.schema[c] for c in value_cols])
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(r_side).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c != key],
        F.struct(*[F.col(c) for c in value_cols]).alias("_vals"),
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(l_side).alias("_side"),
        *[F.col(c) for c in left_cols if c != key],
        F.lit(None).cast(vals_type).alias("_vals"),
    )
    w = (
        W.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = l.unionByName(r).select(
        key,
        "_ts",
        "_side",
        *[c for c in left_cols if c != key],
        F.last("_vals", ignorenulls=True).over(w).alias("_vals"),
    )
    return (
        filled.filter(F.col("_side") == l_side)
        .select(
            key,
            "_ts",
            *[c for c in left_cols if c != key],
            *[F.col("_vals")[c].alias(c) for c in value_cols],
        )
        .drop("_ts")
    )
