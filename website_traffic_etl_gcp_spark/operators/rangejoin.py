"""Bucketed range (interval) join.

Spark has no native interval-join physical operator: `a JOIN b ON
a.ts BETWEEN b.lo AND b.hi` plans as a cross join (or, with an equi
key, a key-join whose per-key output is unbounded) — quadratic blowup
when keys are hot. The scalable shape is time bucketing: quantize the
point's timestamp to one bucket, explode each interval into the
buckets it covers, equi-join on (keys..., bucket), then refine with
the exact predicate. Join fan-out per interval is
ceil(span / bucket_seconds) + 1 rows — a constant — and the join is a
plain shuffled equi-join Catalyst/AQE can plan, salt, and skew-split
like any other.

A point lands in exactly ONE bucket, so a (point, interval) pair can
meet at most once — no post-join dedup. Pick ``bucket_seconds`` near
the typical interval span: wider buckets mean fewer interval copies
but more refine-filter discards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bucketed_range_join"]


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo_col: str,
    hi_col: str,
    keys: tuple[str, ...] = (),
    bucket_seconds: int = 1800,
    open_hi: bool = True,
) -> DataFrame:
    """Inner join of ``points`` to every interval containing them:
    ``lo <= point_ts < hi`` (``open_hi=False`` → ``<= hi``), with
    optional equality ``keys`` present on both sides. Timestamps are
    compared at full precision; bucketing only bounds the candidate
    set."""
    bw = F.lit(int(bucket_seconds))
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_ts).cast("long") / bw).cast("long")
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col).cast("long") / bw).cast("long"),
                F.floor(F.col(hi_col).cast("long") / bw).cast("long"),
            )
        ),
    )
    refine = F.col(point_ts) >= F.col(lo_col)
    refine &= (
        F.col(point_ts) < F.col(hi_col)
        if open_hi
        else F.col(point_ts) <= F.col(hi_col)
    )
    return p.join(iv, [*keys, "__bucket"]).filter(refine).drop("__bucket")
