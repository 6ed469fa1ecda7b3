"""Snapshot reconciliation: diff two versions of a table.

The audit step after any rewrite (compaction, delete, CDC apply,
backfill): classify every business key as unchanged / changed / added
/ removed between a base snapshot and a new snapshot, without shipping
row contents anywhere — rows are compared by an md5 over their
canonicalized column values.

Shuffle shape: one full-outer equi-join on the key. The row hash is
computed map-side BEFORE the join, so only (key, 32-byte hash) moves
through the shuffle — at 100 TB that's the difference between
shuffling the table and shuffling a fingerprint of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_SENTINEL = "∅"  # distinguishes NULL from empty string


def row_hash(df: DataFrame, cols: list[str]) -> F.Column:
    """md5 over the canonicalized values of ``cols`` (order fixed by
    the caller). NULLs map to a sentinel so (NULL) != ('')."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL))
        for c in cols
    ]
    return F.md5(F.concat_ws("|", *parts))


def snapshot_diff(
    base: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Per-key diff status: (keys..., status) with status in
    {unchanged, changed, added, removed}. Non-key columns are compared
    via ``row_hash``; both snapshots must share a schema."""
    value_cols = [c for c in base.columns if c not in keys]
    b = base.select(*keys, row_hash(base, value_cols).alias("__h_base"))
    n = new.select(*keys, row_hash(new, value_cols).alias("__h_new"))
    joined = b.join(n, keys, "full_outer")
    status = (
        F.when(F.col("__h_base").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_base") == F.col("__h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*keys, status.alias("status"))


def diff_summary(base: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Reconciliation report: row counts per diff status."""
    return (
        snapshot_diff(base, new, keys)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
