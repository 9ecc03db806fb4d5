"""Deterministic numeric helpers.

Floating-point SUM/AVG are order-dependent, and a distributed engine does
not control reduction order — so any float aggregate would differ run-to-run
and engine-to-engine in the low bits.  This engine's convention: cast the
measure to an exact DECIMAL before aggregation, aggregate exactly, and cast
the final result back to double.  The decimal sum is exact, so the final
double is bit-identical across partitionings and across engines (the same
convention is applied in the DuckDB oracle SQL).

Source columns here carry at most 2 fractional digits (prices/balances) or
2-digit rates (discount/tax), so DECIMAL(18,2)/(18,4) loses nothing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def one() -> Column:
    """Literal 1 as DECIMAL(1,0).

    A plain int literal promotes to DECIMAL(10,0)+ in arithmetic, inflating
    result precision until a three-factor product exceeds precision 38 and
    Spark silently rounds (allowPrecisionLoss).  A (1,0) literal keeps
    ``price * (1-disc) * (1+tax)`` within DECIMAL(28,10) — fully exact.
    The oracle SQL mirrors this with CAST(1 AS DECIMAL(1,0)).
    """
    return F.lit(1).cast("decimal(1,0)")


def to_dbl(c: Column, scale: int = 2) -> Column:
    """Exact-decimal aggregate → double, deterministically.

    DuckDB's DECIMAL→DOUBLE cast is not correctly rounded (it converts the
    int128 unscaled value and the scale divisor separately — compound
    rounding, off by 1 ulp vs Java's BigDecimal.doubleValue()).  Rounding
    the exact sum to its natural scale first makes value·10^scale < 2^53,
    so BOTH engines' casts are exact and identical.  Oracle SQL mirrors
    this as CAST(ROUND(x, scale) AS DOUBLE).
    """
    return F.round(c, scale).cast("double")
