"""Cancellation bound of the power-sum moment formulas (fp.ccp).

Power sums cancel when mean >> stddev: n*Σx² − (Σx)² loses
~2·log10(|mean|/stddev) leading digits. With the sums cast to double BEFORE
the subtraction, a mean≈1e6 / stddev≈6e-3 column (ratio ~1.7e8 → ~16.5
digits) loses EVERYTHING — the double-first result is pure cast noise.
``fp.ccp`` subtracts in decimal(38,0) (exact), so only the already-small
difference crosses to double. This pins:

1. the Spark decimal path == DuckDB HUGEINT path == exact Python integers
   (to the output rounding), on the hazard column;
2. that the double-first formula is genuinely wrong on the same data
   (the hazard is real, not hypothetical).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from bigtwine_streamprocessor_spark import fp

N = 100_000
MEAN = 1_000_000.0


def _hazard_values() -> list[float]:
    # deviations are exact multiples of 1e-4 (the fp integerization grid):
    # mean 1e6, stddev ≈ 5.8e-3 — mean/stddev ≈ 1.7e8
    return [MEAN + ((i * 37) % 201 - 100) * 1e-4 for i in range(N)]


def _exact_variance_rounded(d: int = 6) -> float:
    # exact integer power sums at the same 4-dp grid, exact subtraction,
    # sample variance, then the repo's floor(x*10^d + 0.5) rounding
    ints = [round(v * 10_000) for v in _hazard_values()]
    sx = sum(ints)
    sxx = sum(v * v for v in ints)
    css = N * sxx - sx * sx  # exact in Python bigints
    var = (css / (N * (N - 1))) / 1e8  # de-scale the 4-dp² integerization
    import math

    return math.floor(var * 10**d + 0.5) / 10**d


def test_ccp_survives_mean_much_greater_than_stddev(spark, tmp_path):
    expected = _exact_variance_rounded()
    assert expected > 0  # the data really has spread

    p = str(tmp_path / "hazard.parquet")
    pd.DataFrame({"x": _hazard_values()}).to_parquet(p)

    df = spark.read.parquet(p)
    xi = F.floor(F.col("x") * F.lit(10000.0) + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    s = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi).alias("sx"),
        F.sum(xi * xi).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    row = s.select(
        fp.rd(
            (fp.ccp(F.col("n"), F.col("sx"), F.col("sx"), F.col("sxx"))
             / (nd * (nd - 1))) / F.lit(1e8),
            6,
        ).alias("var_exact_path"),
        # the pre-fix shape: sums cast to double, then subtracted
        fp.rd(
            ((nd * F.col("sxx").cast("double")
              - F.col("sx").cast("double") * F.col("sx").cast("double"))
             / (nd * (nd - 1))) / F.lit(1e8),
            6,
        ).alias("var_double_first"),
    ).collect()[0]

    assert row["var_exact_path"] == expected
    # the hazard is real: the double-first formula is off by far more than
    # the output rounding (on this data it is negative or zero-ish noise)
    assert row["var_double_first"] != expected

    con = duckdb.connect()
    got = con.execute(
        f"""
        WITH s AS (
            SELECT count(*) AS n,
                   sum(CAST(floor(x * 10000.0 + 0.5) AS HUGEINT)) AS sx,
                   sum(CAST(floor(x * 10000.0 + 0.5) AS HUGEINT)
                       * CAST(floor(x * 10000.0 + 0.5) AS HUGEINT)) AS sxx
            FROM '{p}'
        )
        SELECT {fp.rd_sql(
            "(" + fp.ccp_sql("n", "sx", "sx", "sxx")
            + " / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) / 1e8", 6
        )} FROM s
        """
    ).fetchone()[0]
    assert got == expected
