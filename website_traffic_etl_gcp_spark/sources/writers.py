"""Warehouse writer — reference load.py re-expressed Spark-first.

The reference uploads a CSV and issues a BigQuery load job with
append/truncate disposition and a fixed schema (load.py:67-110), after
copying the raw input to a backup prefix (load.py:50-64). The Spark
analog is a partitioned parquet warehouse table written with the
matching save mode; `backup` is a filesystem copy of the raw input.
Paths are URIs — the same code targets local disks, HDFS, or object
stores (gs://, s3a://) purely through Hadoop filesystem connectors; no
cloud SDK in the data path.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Literal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WriteDisposition = Literal["append", "truncate"]


class LoadError(Exception):
    """Reference-parity failure type (load.py:14)."""


def load_to_warehouse(
    df: DataFrame,
    table_path: str,
    disposition: WriteDisposition = "append",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write the transformed frame as the warehouse table. ``append``
    matches WRITE_APPEND, ``truncate`` WRITE_TRUNCATE (load.py:86-90).
    Partitioning by a date column keeps per-day pruning effective at
    scale."""
    if disposition not in ("append", "truncate"):
        raise LoadError(f"Invalid write disposition: {disposition}")
    mode = "append" if disposition == "append" else "overwrite"
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(table_path)


def backup_raw(source_path: str, backup_dir: str, run_timestamp: str) -> str:
    """Copy the raw input aside before loading (load.py:50-64 parity).
    Local-path implementation; on a real cluster this is a same-store
    server-side copy."""
    src = Path(source_path)
    dest_dir = Path(backup_dir)
    dest_dir.mkdir(parents=True, exist_ok=True)
    dest = dest_dir / f"original_{run_timestamp}{src.suffix}"
    if src.is_dir():
        shutil.copytree(src, dest, dirs_exist_ok=True)
    else:
        shutil.copy2(src, dest)
    return str(dest)


def save_csv(df: DataFrame, out_dir: str, run_timestamp: str) -> str:
    """Timestamped CSV export (transform.py:66-72 parity), written
    distributed (a directory of part files, not a single driver-side
    file — coalescing 100 TB to one file is the classic anti-pattern)."""
    path = f"{out_dir.rstrip('/')}/traffic_data_{run_timestamp}.csv"
    df.write.mode("overwrite").option("header", "true").csv(path)
    return path


def read_warehouse(spark: SparkSession, table_path: str) -> DataFrame:
    return spark.read.parquet(table_path)


def dedupe_warehouse(df: DataFrame, key_cols: tuple[str, ...]) -> DataFrame:
    """Idempotent-append compaction: keep the newest created_at per
    key (see plans/etl.py:etl_append_dedup for the oracle-checked
    semantics)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(F.col("created_at").desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
