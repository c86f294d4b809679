"""Stream sampling / throttling (F2, `TwitterStatusSamplingFilter.java:21-27`).

The reference caps the live stream at N tweets/s by keeping the last-emit
wall-clock in operator state — inherently non-deterministic (SURVEY.md §7.4
flags it must not be golden-compared). Two Spark realizations:

* **deterministic_sample** — the testable analog: keep ``1/k`` of rows chosen
  by a portable md5-derived hash of the key. Pure Column expression, exact
  same rows in Spark and DuckDB, stable under repartitioning (unlike
  ``F.rand`` or per-partition counters).
* **rate_limit_per_partition** — the faithful wall-clock throttle for
  streaming micro-batches: an Arrow-batched ``mapInPandas`` that forwards at
  most ``max_rows_per_second * elapsed`` rows per partition. Property-tested
  (cap holds), never golden-compared. On a cluster the idiomatic cap is the
  source option (``maxOffsetsPerTrigger`` / ``maxFilesPerTrigger``) — this
  operator exists for semantic parity with the reference's in-stream filter.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_predicate(key_col: str, k: int) -> Column:
    """Keep rows where md5(key) mod k == 0 (portable, deterministic)."""
    bucket = F.conv(F.substring(F.md5(F.col(key_col)), 1, 8), 16, 10).cast("long") % k
    return bucket == 0


def deterministic_sample(df: DataFrame, key_col: str, k: int) -> DataFrame:
    return df.filter(sample_predicate(key_col, k))


def sample_sql(key_col: str, k: int) -> str:
    """DuckDB predicate computing the identical sample."""
    return (
        f"CAST(concat('0x', substr(md5({key_col}), 1, 8)) AS BIGINT) % {k} = 0"
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-data mix operator
    (e.g. downsample over-represented languages): keep a row iff its salted
    md5 fraction u(key) in [0,1) falls below the stratum's rate. Pure Column
    expression (zero-shuffle scan-time filter, stable under repartitioning);
    the DuckDB twin computes the identical row set."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}|"), F.col(key_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(float(r))).otherwise(
            rate
        )
    return df.filter(u < rate)


def stratified_sample_sql(
    stratum_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "strat",
) -> str:
    whens = " ".join(
        f"WHEN {stratum_col} = '{s}' THEN {float(r)}"
        for s, r in sorted(rates.items())
    )
    u = (
        f"(CAST(concat('0x', substr(md5('{salt}|' || CAST({key_col} AS VARCHAR)), 1, 8)) AS BIGINT)"
        f" / 4294967296.0)"
    )
    return f"{u} < (CASE {whens} ELSE {float(default_rate)} END)"


def rate_limit_per_partition(
    df: DataFrame, max_rows_per_second: float
) -> DataFrame:
    """Wall-clock throttle: emit at most N rows/s per partition (the
    reference's semantics, generalized from its parallelism-1 constraint —
    a P-partition stream caps at P*N rows/s; divide accordingly)."""

    schema = df.schema

    def limiter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        start = time.monotonic()
        emitted = 0
        for pdf in batches:
            budget = int((time.monotonic() - start) * max_rows_per_second) + 1
            room = max(budget - emitted, 0)
            if room <= 0:
                continue
            out = pdf.head(room)
            emitted += len(out)
            if len(out):
                yield out

    return df.mapInPandas(limiter, schema)
