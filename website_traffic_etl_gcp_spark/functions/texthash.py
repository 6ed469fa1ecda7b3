"""Text normalization + engine-portable hashing.

Both Spark and DuckDB implement ``md5`` identically (hex string), so
every hash-derived value in the engine (exact-dup keys, minhash
permutations, fingerprints) goes through md5 → hex-prefix → int64. That
keeps the dedup family oracle-checkable bit-for-bit while staying fully
JVM-side in Spark (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """Lowercase, collapse whitespace, strip — the canonical form every
    text operator hashes/tokenizes over."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def word_tokens(col: Column | str) -> Column:
    """array<string> of word tokens from normalized text."""
    return F.split(normalize_text(col), " ")


def md5_long(col: Column) -> Column:
    """Deterministic non-negative int64 from md5's first 15 hex chars
    (60 bits — fits int64, same value computable in DuckDB SQL as
    ``CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


# SQL fragment templates for the DuckDB oracle side, kept next to the
# Spark definitions so they evolve together.
SQL_NORMALIZE = "trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"
SQL_MD5_LONG = "CAST(('0x' || substr(md5({col}), 1, 15)) AS BIGINT)"
