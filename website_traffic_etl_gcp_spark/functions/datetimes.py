"""Datetime column helpers.

The reference parses day-first ``dd/mm/YY`` raw strings and re-formats
to ISO ``%Y-%m-%d %H:%M:%S`` (reference transform.py:16-28). Spark's
``to_timestamp`` with an explicit pattern is the declarative equivalent
— unparseable values become NULL (quarantined downstream) instead of
aborting the job, which is the only sane failure mode at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Patterns tried in order — first match wins. The reference's pandas
# to_datetime(dayfirst=True) accepts two-digit years and date-only
# values (its docstring says dd/mm/YY), so the port does too. Java's
# `yy` maps 00-99 onto 2000-2099 (base-2000 reduced field); that pivot
# is part of this engine's contract and the DuckDB oracles reproduce it.
# Single-letter day/month/hour fields (`d`, `M`, `H`) accept one OR two
# digits, matching pandas dayfirst=True on `1/2/2024 9:05:00`-shaped
# input; minutes/seconds stay strict two-digit (`mm:ss`) on both the
# Spark and the DuckDB-oracle side — `9:5:0` is quarantined, pinned in
# tests/test_traffic_transform.py.
DAYFIRST_FMTS = (
    "d/M/yyyy H:mm:ss",
    "d/M/yy H:mm:ss",
    "d/M/yyyy",
    "d/M/yy",
)
DAYFIRST_FMT = DAYFIRST_FMTS[0]
ISO_FMT = "yyyy-MM-dd HH:mm:ss"


def parse_dayfirst(
    col: Column | str, fmts: str | tuple[str, ...] = DAYFIRST_FMTS
) -> Column:
    """First successful parse among ``fmts``; NULL if none match.
    Each pattern must consume the whole string (Java semantics), so a
    timestamped string never half-matches a date-only pattern."""
    c = F.col(col) if isinstance(col, str) else col
    if isinstance(fmts, str):
        fmts = (fmts,)
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in fmts])


def iso_str(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, ISO_FMT)


def day_str(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


def hour_str(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:00:00")
