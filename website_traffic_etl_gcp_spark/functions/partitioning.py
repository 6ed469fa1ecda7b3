"""Input-width control for CPU-heavy map stages.

A small parquet table arrives in as few split-partitions as its byte
size dictates (`spark.sql.files.maxPartitionBytes`), which serializes
every expensive narrow transformation downstream of the scan: a 30 MB
documents table lands in 2 partitions, so a shingle explode / vector
norm / per-token hash runs on 2 of the executor's 32 cores until the
first shuffle. Fanning the scan out first costs one cheap shuffle of
the small input and buys full parallelism for the map stage
(measured at sf1: jaccard tier 12.3 s → 6.3 s, brute-force ANN scan
5.1 s → 1.2 s).

This is ONLY for narrow-input/CPU-heavy shapes. The guard makes it a
strict no-op on wide inputs — at 100 TB every scan already has more
partitions than the cluster has cores, so the repartition never fires
and no shuffle is added.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

WIDEN_FACTOR = 2  # partitions per core after fan-out

# Don't fan out below this many (estimated) bytes per resulting
# partition: when the input is tiny the repartition's own shuffle
# costs more wall-clock than the parallelism buys back (measured at
# sf0.1: +0.6 s on the jaccard tier for a 0.6 MB scan). Call sites
# whose per-byte CPU is extreme (md5 per n-gram, per-row vector math)
# pass a lower floor — for them even KB-sized partitions pay off
# (DSIR at sf1: 48 s serialized vs 7 s fanned out).
DEFAULT_MIN_PARTITION_BYTES = 32 * 1024
CPU_HEAVY_MIN_PARTITION_BYTES = 4 * 1024


def _estimated_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimizer size estimate (file-size-derived for
    scans) — available at plan time, no job."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return None


def _bytes_conf(spark, key: str, default: int) -> int:
    """Parse a Spark byte-string conf ("134217728", "128m", "1g")."""
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    mult = 1
    for suf, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if raw.endswith(suf + "b"):
            raw, mult = raw[:-2], m
            break
        if raw.endswith(suf):
            raw, mult = raw[:-1], m
            break
    if raw.endswith("b"):
        raw = raw[:-1]
    try:
        return int(float(raw) * mult)
    except ValueError:
        return default


def widen_narrow_input(
    df: DataFrame,
    factor: int = WIDEN_FACTOR,
    min_partition_bytes: int = DEFAULT_MIN_PARTITION_BYTES,
) -> DataFrame:
    """Round-robin repartition ``df`` up to ``cores × factor``
    partitions iff its Catalyst size estimate says the scan would
    arrive narrower than that AND it is big enough that the fan-out's
    shuffle pays for itself — the cheap-input/expensive-map fan-out.
    Wide or too-small inputs pass through untouched (at 100 TB every
    scan is already wide, so this never adds a shuffle).

    The guard reads ONLY plan-time metadata (optimizer stats + the
    files.maxPartitionBytes split size) — never ``df.rdd``, which
    would force full physical planning plus a DataFrame→RDD
    conversion on every call, paid even when the call is a no-op."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * factor
    est = _estimated_bytes(df)
    if est is None:
        return df
    if est < target * min_partition_bytes:
        return df
    max_pb = _bytes_conf(
        spark, "spark.sql.files.maxPartitionBytes", 128 * 1024 * 1024
    )
    if est // max_pb >= target:
        # scan already splits at least as wide as the fan-out target
        return df
    # an explicit in-plan repartition to >= target partitions means the
    # frame is already wide regardless of its byte estimate — read it
    # off the (already-computed) optimized plan, still zero jobs
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    widths = re.findall(r"Repartition(?:ByExpression)?[^\d]{0,40}?(\d+)", plan)
    if widths and max(int(w) for w in widths) >= target:
        return df
    return df.repartition(target)
