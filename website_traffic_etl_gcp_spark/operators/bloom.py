"""Portable Bloom-filter semi-join reduction.

The runtime-filter technique behind big-join speedups at 100 TB: build
a compact membership sketch of the SELECTIVE side's join keys, push it
into the scan of the LARGE side so most non-matching rows die before
the shuffle, then let the exact join remove the sketch's false
positives. Spark's optimizer injects this automatically in some plans
(`runtime.bloomFilter`); this operator is the explicit, engine-portable
form — md5-derived bit positions, so DuckDB can reproduce the exact
same filter, false positives included.

Implementation notes:
- k hash positions per key: ``md5(key || '#' || i) % m``.
- The "bitmap" is a distinct-positions relation (≤ m rows of ints),
  broadcast; membership = k broadcast LEFT SEMI joins, one per hash.
  No driver-side collect, no UDF — the probe stays in codegen.
- m defaults to 1<<13: at 8 KB-equivalent it broadcasts anywhere; size
  m ≈ 10–15 bits/key for ~1% false positives before the exact join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.texthash import md5_long

BLOOM_M = 1 << 13
BLOOM_K = 3


def _position(key: Column, i: int, m: int) -> Column:
    return (md5_long(F.concat(key.cast("string"), F.lit(f"#{i}"))) % m).cast(
        "int"
    )


def bloom_positions(df: DataFrame, key: str, m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """The sketch: distinct occupied bit positions of the build side —
    a ≤ m-row int relation (the portable stand-in for a bitmap)."""
    pos = F.explode(
        F.array(*[_position(F.col(key), i, m) for i in range(k)])
    ).alias("__pos")
    return df.select(pos).distinct()


def bloom_prefilter(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Rows of ``probe`` whose key passes the Bloom membership test
    against ``build``'s keys (false positives possible — follow with
    the exact join; false negatives impossible)."""
    bits = bloom_positions(build, build_key, m, k)
    out = probe
    for i in range(k):
        probe_bits = bits.select(F.col("__pos").alias(f"__pos{i}"))
        out = out.join(
            F.broadcast(probe_bits),
            _position(F.col(probe_key), i, m) == F.col(f"__pos{i}"),
            "left_semi",
        )
    return out
