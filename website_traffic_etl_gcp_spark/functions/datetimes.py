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

DAYFIRST_FMT = "dd/MM/yyyy HH:mm:ss"
ISO_FMT = "yyyy-MM-dd HH:mm:ss"


def parse_dayfirst(col: Column | str, fmt: str = DAYFIRST_FMT) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt))


def iso_str(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, ISO_FMT)


def day_str(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


def hour_str(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:00:00")
