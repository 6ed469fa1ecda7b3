"""Bucketed warehouse tables: shuffle-free co-located joins.

At 100 TB the orders⋈lineitem join is the dominant shuffle in every
revenue query. Writing both tables bucketed by the join key (same
bucket count) lets Spark plan a SortMergeJoin with NO Exchange on
either side — the co-location is established once at write time and
amortized over every subsequent join. This module owns the bucketed
layout; tests/test_bucketing.py asserts the exchange-free plan.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 8


def is_published(path: str) -> bool:
    """A location counts as published only when the whole directory
    landed via the atomic rename in ``publish_bucketed`` — the
    ``_SUCCESS`` marker rides inside the renamed dir, so a half-built
    or crashed write is never mistaken for a live table."""
    return os.path.isfile(os.path.join(path, "_SUCCESS"))


def register_bucketed(
    spark: SparkSession,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None,
    path: str,
) -> None:
    """Point ``table_name`` at an already-published bucketed location
    (schema read from the parquet footers; the bucket spec must match
    the one the files were written with — Spark recovers per-file
    bucket ids from the ``_000NN`` filename component). No-op when the
    session already has the table: published locations are immutable
    (content-keyed names + first-writer-wins publish), so an existing
    registration is never stale."""
    if spark.catalog.tableExists(table_name):
        return
    schema = spark.read.parquet(path).schema
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    sort = f" SORTED BY (`{sort_col}` ASC)" if sort_col else ""
    spark.sql(
        f"CREATE TABLE `{table_name}` ({cols}) USING PARQUET "
        f"CLUSTERED BY (`{bucket_col}`){sort} INTO {n_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )


def _fsync_dir(path: str) -> None:
    try:
        fd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
    except OSError:
        pass  # fsync of a directory is best-effort on some filesystems


def _one_file_per_bucket(
    df: DataFrame, bucket_col: str, n_buckets: int
) -> DataFrame:
    """Repartition on the bucket column before a bucketed write so
    each writer task holds exactly one bucket's rows. Without this the
    write emits (writer tasks × buckets) files — the measured bands
    index at sf0.1 was 2048 files for 17 MB, and its probe-side scan
    spent ~0.75 s of a 10k-row read on per-file open overhead (guide
    §6's small-files problem, paid on EVERY probe). repartition(n,
    col) and bucketBy(n, col) share the same pmod(murmur3) routing, so
    the shuffle aligns rows exactly one bucket per task; layout-only —
    bytes, rows and bucket ids are unchanged."""
    return df.repartition(n_buckets, F.col(bucket_col))


def publish_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None,
    path: str,
) -> None:
    """Atomic build-once publish of an EXTERNAL bucketed table:
    build into ``<path>.tmp.<pid>``, fsync, and atomically rename into
    ``path`` — never rmtree a live location. If another process
    published first (rename fails because the destination exists), its
    content wins and ours is discarded: locations are content-keyed by
    the caller (``dedup_index.index_table_name`` hashes the corpus
    state into the name), so concurrent builders produce identical
    bytes and first-writer-wins is safe. This is what makes the
    persisted indexes genuinely build-once-probe-many ACROSS processes
    — a second job registers the published location instead of paying
    the corpus-wide build again."""
    spark = df.sparkSession
    path = os.path.abspath(path)
    if not is_published(path):
        tmp_path = f"{path}.tmp.{os.getpid()}"
        tmp_table = f"{table_name}__build_{os.getpid()}"
        spark.sql(f"DROP TABLE IF EXISTS `{tmp_table}`")
        shutil.rmtree(tmp_path, ignore_errors=True)  # own leftovers only
        writer = (
            _one_file_per_bucket(df, bucket_col, n_buckets)
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, bucket_col)
        )
        if sort_col:
            writer = writer.sortBy(sort_col)
        writer.option("path", tmp_path).saveAsTable(tmp_table)
        # external table: dropping the catalog entry keeps the files
        spark.sql(f"DROP TABLE IF EXISTS `{tmp_table}`")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        try:
            os.rename(tmp_path, path)
            _fsync_dir(os.path.dirname(path) or ".")
        except OSError:
            # lost the publish race — the winner's identical content
            # is already live; discard our build
            shutil.rmtree(tmp_path, ignore_errors=True)
    register_bucketed(spark, table_name, bucket_col, n_buckets, sort_col, path)


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
    table is EXTERNAL at that location via the atomic content-keyed
    publish (see ``publish_bucketed`` — reuses an already-published
    location instead of overwriting it); otherwise managed, with plain
    overwrite semantics."""
    if path:
        publish_bucketed(df, table_name, bucket_col, n_buckets, sort_col, path)
        return
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a crashed previous write can orphan the managed location
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    if wh:
        shutil.rmtree(f"{wh.rstrip('/')}/{table_name}", ignore_errors=True)
    writer = (
        _one_file_per_bucket(df, bucket_col, n_buckets)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str,
    right_key: str,
) -> DataFrame:
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
