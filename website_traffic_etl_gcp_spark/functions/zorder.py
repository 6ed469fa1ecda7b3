"""Z-order (Morton) clustering key.

Sorting a table by one column gives tight min/max file statistics for
that column only; queries filtering the OTHER columns prune nothing.
Interleaving the bits of several columns into one sort key keeps every
participating column's values locally clustered, so row-group and file
min/max ranges stay narrow on ALL of them — the multi-dimensional
pruning trick lakehouse OPTIMIZE implementations use.

Pure bit arithmetic on int64 (shifts, masks, adds) — stays inside
whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["zorder_key"]


def zorder_key(*cols: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column (clamped to
    [0, 2^bits); caller maps values into that range — e.g. a modulus,
    a rank, or a quantile bucket). With ``n`` columns the key uses
    ``n × bits`` bits; keep ≤ 62 total for int64."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if n * bits > 62:
        raise ValueError(f"{n} cols × {bits} bits exceeds int64 range")
    mask = (1 << bits) - 1
    key = F.lit(0).cast("bigint")
    for ci, c in enumerate(cols):
        v = (F.col(c) if isinstance(c, str) else c).cast("bigint").bitwiseAND(
            F.lit(mask)
        )
        for b in range(bits):
            bit = F.shiftright(v, b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * n + ci)
    return key
