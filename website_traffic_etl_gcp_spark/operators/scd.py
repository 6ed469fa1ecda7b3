"""Slowly-changing-dimension (type 2) maintenance.

The warehouse-side half of every CDC pipeline: a change batch lands,
and instead of overwriting the dimension row, the current version is
CLOSED (valid_to = change timestamp) and a new version APPENDED — so
facts joined "as of" any date resolve to the attributes that were true
then.

Shuffle shape: one equi-join of dim × changes on the business key plus
one anti-join for brand-new keys; the four result branches (unchanged,
closed, reopened, inserted) are unions of projections over those two
joins — no window, no iterative pass. At 100 TB the dim side is
usually the small one: broadcast it against a large change stream, or
bucket both on the key for a shuffle-free sort-merge.

On a lakehouse table format this whole operator is the SQL
``MERGE INTO`` body; on plain parquet the output replaces the
dimension snapshot atomically (see sources/writers.py staging swaps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_END = None  # valid_to of the current version


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    attr: str,
    change_ts: str,
) -> DataFrame:
    """Apply a change batch to an SCD2 dimension.

    ``dim``:     (key, attr, valid_from, valid_to, is_current) — only
                 current rows (valid_to NULL) are eligible to close.
    ``changes``: (key, new_<attr>, change ts column named ``change_ts``).

    A change whose new value equals the current value is a no-op (no
    version churn — the idempotency property a replayed CDC stream
    needs). Returns the full new dimension snapshot.
    """
    new_attr = f"new_{attr}"
    ch = changes.select(key, new_attr, change_ts)
    joined = dim.join(F.broadcast(ch), key, "left")

    # null-safe comparison: with a NULL current attribute, plain `!=`
    # evaluates NULL and the row would fall out of BOTH filter branches
    # (silently dropped); eqNullSafe keeps three-valued logic out of
    # the routing decision
    is_effective = (
        F.col(new_attr).isNotNull()
        & F.col("is_current")
        & ~F.col(new_attr).eqNullSafe(F.col(attr))
    )

    untouched = joined.filter(~is_effective).select(*dim.columns)
    closed = joined.filter(is_effective).select(
        F.col(key),
        F.col(attr),
        F.col("valid_from"),
        F.col(change_ts).alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    reopened = joined.filter(is_effective).select(
        F.col(key),
        F.col(new_attr).alias(attr),
        F.col(change_ts).alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    inserted = (
        ch.join(dim.select(key), key, "left_anti")
        .select(
            F.col(key),
            F.col(new_attr).alias(attr),
            F.col(change_ts).alias("valid_from"),
            F.lit(None).cast("string").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return (
        untouched.unionByName(closed)
        .unionByName(reopened)
        .unionByName(inserted)
    )
