"""The narrow-input fan-out contract (functions/partitioning.py):
narrow inputs above the byte floor get repartitioned up to cluster
parallelism; wide inputs and too-small inputs pass through with NO
added exchange — the guards that keep the helper a no-op both at real
scale (already wide) and at toy scale (fan-out shuffle would cost
more than it buys)."""

from __future__ import annotations

from website_traffic_etl_gcp_spark.functions.partitioning import (
    WIDEN_FACTOR,
    widen_narrow_input,
)


def test_narrow_input_fans_out(spark):
    target = spark.sparkContext.defaultParallelism * WIDEN_FACTOR
    narrow = spark.range(1000).coalesce(1)
    widened = widen_narrow_input(narrow, min_partition_bytes=0)
    assert widened.rdd.getNumPartitions() == target
    assert widened.count() == 1000


def test_tiny_input_skips_fanout(spark):
    # a KB-sized frame stays put under the default byte floor: the
    # repartition's own shuffle would cost more than it buys
    tiny = spark.range(1000).coalesce(1)
    out = widen_narrow_input(tiny)
    assert out is tiny


def test_wide_input_untouched(spark):
    target = spark.sparkContext.defaultParallelism * WIDEN_FACTOR
    wide = spark.range(1000).repartition(target + 7)
    out = widen_narrow_input(wide, min_partition_bytes=0)
    # identity — same plan object, so no exchange is ever added
    assert out is wide
