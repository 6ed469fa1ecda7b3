"""Decimal-exact money arithmetic.

The testdata stores money-like values (prices, discounts, balances) as
float64 with 2-decimal precision. Summing doubles is order-dependent
(shuffle order differs run to run and engine to engine), which breaks
bit-exact comparison against any oracle. Casting to DECIMAL(18,2) before
aggregation makes every sum exact and engine-independent, at zero cost to
Spark (decimal aggregation stays inside whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"
# Wide enough for sums over ~10^10 rows of 10^5-sized values.
MONEY_WIDE = "decimal(38,4)"


def dec(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact decimal sum, emitted as double: the sum itself is exact and
    engine-independent, and converting one exact decimal to double is
    deterministic — unlike summing doubles directly (order-dependent) or
    emitting decimals (textual form differs across engines)."""
    return F.sum(dec(col, scale)).cast("double")


def dec_avg(col: Column | str, scale: int = 2) -> Column:
    """Deterministic average: exact decimal sum → double, divided by
    count → double. Both engines convert the same exact decimal to the
    same double and IEEE-754 double division is deterministic, so no
    rounding fudge is needed (decimal division would round differently
    per engine's scale rules)."""
    return F.sum(dec(col, scale)).cast("double") / F.count(F.lit(1)).cast("double")
