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
