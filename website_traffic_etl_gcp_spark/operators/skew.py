"""Skew-handling join: explicit salting for hot keys.

AQE's skew-join split handles most cases at runtime; explicit salting
is the tool when a single join key is pathologically hot (the
power-law user, the null-ish default key) and you know it up front.
Mechanics: the large (skewed) side gets a random-ish salt derived from
a high-cardinality column; the small side is replicated across all
salt values with ``explode(sequence(...))``; joining on (key, salt)
spreads each hot key over ``n_salts`` reducers. Result is EXACTLY the
plain join — verified by the oracle in plans/advanced.py."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salted_join(
    large: DataFrame,
    small: DataFrame,
    large_key: str,
    small_key: str,
    salt_source: Column,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Inner join ``large ⋈ small`` on key equality, with the large
    side salted by ``salt_source % n_salts`` and the small side
    replicated n_salts times. ``salt_source`` must be deterministic
    per-row (a row id — NOT rand(), which breaks retries/resume)."""
    sl = large.withColumn("__salt", salt_source % n_salts).alias("L")
    rs = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).alias("R")
    cond = (F.col(f"L.{large_key}") == F.col(f"R.{small_key}")) & (
        F.col("L.__salt") == F.col("R.__salt")
    )
    out_cols = [F.col(f"L.{c}") for c in large.columns] + [
        F.col(f"R.{c}") for c in small.columns
    ]
    return sl.join(rs, cond).select(*out_cols)
