"""Cross-engine deterministic fixed-point rounding.

Engine round() differs exactly at half ties (Spark BigDecimal HALF_UP vs
DuckDB nearbyint HALF_EVEN — caught live by the r5 sf0.1 sweep on
quality_score), so every oracle-paired output surface rounds with the
explicit floor(x*10^d + 0.5)/10^d IEEE sequence instead: identical ops on
both engines, so tie-breaking is defined by the arithmetic. Bonus: the floor
yields an exact integer and 0/10^d is always +0.0, so -0.0 can't leak into
serialized output either.

For negative x this is "half toward +infinity" rather than BigDecimal's
"half away from zero" — a DIFFERENT convention than either engine's round(),
but the same one on both engines, which is the property that matters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rd(col, d: int) -> Column:
    """d-dp half-up rounding of a Column (or column name) — see module doc."""
    if isinstance(col, str):
        col = F.col(col)
    m = F.lit(float(10 ** d))
    return F.floor(col * m + F.lit(0.5)) / m


def rd_sql(expr: str, d) -> str:
    """SQL twin of ``rd``. ``d`` may be an int or a source-text placeholder
    (e.g. an f-string constant); non-literal scales use power(10.0, d),
    which is exact for the small d used anywhere in this repo."""
    try:
        m = repr(float(10 ** int(d)))
    except (TypeError, ValueError):
        m = f"power(10.0, {d})"
    return f"(floor(({expr}) * {m} + 0.5) / {m})"


# --- order-independent money sums ------------------------------------------
#
# round(SUM(double), 2) is NOT cross-engine stable at scale: the unrounded
# double sums differ by summation order (Spark partial aggs vs DuckDB), and
# once the true value sits within an ulp of a .xx5 boundary the two engines
# round to different cents. The r6 sf1 sweep caught exactly this on
# join_fact_fact (sum(o_totalprice): ...970.32 vs ...970.33 at ~2e10).
#
# Fix: fixed-point accounting. Integerize each addend at scale_dp (every
# money column in the corpus is exact at 4 dp — prices/balances/values are
# 2 dp, o_totalprice is 4 dp, and products of two 2-dp values are exact
# 4-dp), sum the integers EXACTLY in 38-digit decimal (HUGEINT on DuckDB),
# and convert once at the end. Integer addition is order-independent, and
# both engines cast the SAME exact integer to double, so the result is
# bit-identical under any partitioning at any scale.

FSUM_SCALE_DP = 4  # basis points: exact for every money column in testdata


def fsum(col, out_dp: int = 2, scale_dp: int = FSUM_SCALE_DP) -> Column:
    """Deterministic SUM of fixed-point data, rounded to out_dp (double)."""
    if isinstance(col, str):
        col = F.col(col)
    s = F.lit(float(10 ** scale_dp))
    tot = F.sum(F.floor(col * s + F.lit(0.5)).cast("decimal(38,0)"))
    return rd(tot.cast("double") / s, out_dp)


def fsum_sql(expr: str, out_dp: int = 2, scale_dp: int = FSUM_SCALE_DP) -> str:
    s = repr(float(10 ** scale_dp))
    inner = (
        f"(CAST(sum(CAST(floor(({expr}) * {s} + 0.5) AS HUGEINT)) AS DOUBLE)"
        f" / {s})"
    )
    return rd_sql(inner, out_dp)


# --- decimal-exact central moments ------------------------------------------
#
# The power-sum moment formulas (variance/covariance/correlation) subtract
# two near-equal products: n*Σx² − (Σx)² cancels ~2*log10(|mean|/stddev)
# leading digits. Casting the EXACT decimal power sums to double BEFORE the
# subtraction throws those digits away at the cast (double holds ~15.9);
# with mean ~1e6 and stddev ~1e-2 the entire result is cast noise
# (pinned by tests/test_moments.py). Doing the multiply-subtract in
# decimal(38,0)/HUGEINT keeps the difference exact — it is the SMALL number
# n²·var, so the one double cast afterwards is safe — and identical on both
# engines under any partitioning.
#
# Exactness bound: the intermediate products must fit the accumulator
# (decimal38 ≈ 1e38, HUGEINT = int128 ≈ 1.7e38). With 4-dp integerized
# money (|x_int| ≤ ~1e10), (Σx)² ≤ 1e38 holds through ~1e9 rows per group;
# beyond that, pre-shift each column by a per-group anchor (first value)
# before integerizing — same formulas, deviations instead of magnitudes.


def ccp(n: Column, sx: Column, sy: Column, sxy: Column) -> Column:
    """Exact corrected cross-product n*Σxy − Σx·Σy as double.

    ``n`` is a bigint count column; ``sx``/``sy``/``sxy`` are decimal(38,0)
    power sums. Variance/css is the x==y case: ``ccp(n, sx, sx, sxx)``.
    """
    nd = n.cast("decimal(38,0)")
    return (nd * sxy - sx * sy).cast("double")


def ccp_sql(n: str, sx: str, sy: str, sxy: str) -> str:
    """SQL twin of ``ccp`` (HUGEINT arithmetic, one cast at the end)."""
    return (
        f"CAST(CAST({n} AS HUGEINT) * ({sxy}) - ({sx}) * ({sy}) AS DOUBLE)"
    )
