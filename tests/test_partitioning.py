"""The narrow-input fan-out contract (functions/partitioning.py):
narrow inputs get repartitioned up to cluster parallelism, wide inputs
pass through with NO added exchange — the guard that keeps the helper
a no-op at real scale."""

from __future__ import annotations

from website_traffic_etl_gcp_spark.functions.partitioning import (
    WIDEN_FACTOR,
    widen_narrow_input,
)


def test_narrow_input_fans_out(spark):
    target = spark.sparkContext.defaultParallelism * WIDEN_FACTOR
    narrow = spark.range(1000).coalesce(1)
    widened = widen_narrow_input(narrow)
    assert widened.rdd.getNumPartitions() == target
    assert widened.count() == 1000


def test_wide_input_untouched(spark):
    target = spark.sparkContext.defaultParallelism * WIDEN_FACTOR
    wide = spark.range(1000).repartition(target + 7)
    out = widen_narrow_input(wide)
    # identity — same plan object, so no exchange is ever added
    assert out is wide
