"""Bucketed warehouse tables: shuffle-free co-located joins.

At 100 TB the orders⋈lineitem join is the dominant shuffle in every
revenue query. Writing both tables bucketed by the join key (same
bucket count) lets Spark plan a SortMergeJoin with NO Exchange on
either side — the co-location is established once at write time and
amortized over every subsequent join. This module owns the bucketed
layout; tests/test_bucketing.py asserts the exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table. Bucket
    count must match across tables meant to co-join. With ``path`` the
    table is EXTERNAL at that location (useful when the session's
    warehouse dir may not be writable — e.g. index tables under a
    scratch root); otherwise managed."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    if path:
        # a crashed previous write (or a previous process) can leave
        # orphan files at the external location
        shutil.rmtree(path, ignore_errors=True)
    else:
        # a crashed previous write can orphan the managed location
        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        if wh.startswith("file:"):
            wh = wh[len("file:"):]
        if wh:
            shutil.rmtree(
                f"{wh.rstrip('/')}/{table_name}", ignore_errors=True
            )
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str,
    right_key: str,
) -> DataFrame:
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
