"""Portable Count–Min sketch for heavy-hitter frequency estimation.

The streaming/constant-memory answer to "how often does each token
appear" over a corpus too large to hold exact counts for: d hash rows
× w counters; an item's estimate is the MIN of its d counters.
Overestimates only (collisions add, never subtract) — the one-sided
error is what makes the sketch driver-checkable: est ≥ exact is a
certainty, and the overshoot is bounded by the collision mass.

Everything is column algebra over md5-derived positions (identical in
any engine): building the sketch is one explode + one groupBy into a
d×w relation (tiny, broadcastable); probing joins each query item to
its d counters and takes the least. No driver-side state, no UDF.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.texthash import md5_long

CMS_W = 4096  # counters per hash row
CMS_D = 3  # hash rows


def _pos(item: Column, j: int, w: int) -> Column:
    return (md5_long(F.concat(item.cast("string"), F.lit(f"${j}"))) % w).cast(
        "int"
    )


def cms_build(items: DataFrame, item_col: str, w: int = CMS_W, d: int = CMS_D) -> DataFrame:
    """d×w counter relation from one pass over the item stream:
    (row j, pos, cnt). Map-side combinable groupBy — the sketch is the
    aggregation state itself."""
    cells = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _pos(F.col(item_col), j, w).alias("pos"),
                    )
                    for j in range(d)
                ]
            )
        ).alias("c")
    ).select("c.j", "c.pos")
    return cells.groupBy("j", "pos").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    queries: DataFrame,
    sketch: DataFrame,
    item_col: str,
    w: int = CMS_W,
    d: int = CMS_D,
) -> DataFrame:
    """Attach ``cms_est`` to each query row: min over the d probed
    counters (a missing counter means count 0)."""
    out = queries
    for j in range(d):
        cj = sketch.filter(F.col("j") == j).select(
            F.col("pos").alias(f"__p{j}"), F.col("cnt").alias(f"__c{j}")
        )
        out = out.join(
            F.broadcast(cj),
            _pos(F.col(item_col), j, w) == F.col(f"__p{j}"),
            "left",
        ).drop(f"__p{j}")
    est = reduce(
        F.least,
        [F.coalesce(F.col(f"__c{j}"), F.lit(0)) for j in range(d)],
    )
    return out.withColumn("cms_est", est.cast("bigint")).drop(
        *[f"__c{j}" for j in range(d)]
    )
