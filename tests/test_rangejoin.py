"""Bucketed range join: exact edge semantics and bounded fan-out."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.operators.rangejoin import bucketed_range_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(sec, us=0):
    return T0 + dt.timedelta(seconds=sec, microseconds=us)


def test_range_join_edges_and_keys(spark):
    # interval [t+10, t+70) spans a 60s bucket boundary
    intervals = spark.createDataFrame(
        [(100, 1, _ts(10), _ts(70))], ["iv_id", "k", "lo", "hi"]
    )
    points = spark.createDataFrame(
        [
            (1, 1, _ts(10)),            # == lo -> included
            (2, 1, _ts(69, 999999)),    # just under hi -> included
            (3, 1, _ts(70)),            # == hi -> excluded (open_hi)
            (4, 1, _ts(9, 999999)),     # just under lo -> excluded
            (5, 2, _ts(30)),            # wrong key -> excluded
            (6, 1, _ts(30)),            # mid-interval, other bucket side
        ],
        ["pt_id", "k", "ts"],
    )
    out = bucketed_range_join(
        points, intervals, "ts", "lo", "hi", keys=("k",), bucket_seconds=60
    )
    got = sorted(r["pt_id"] for r in out.collect())
    assert got == [1, 2, 6]

    # closed-hi variant admits the boundary point
    out2 = bucketed_range_join(
        points, intervals, "ts", "lo", "hi", keys=("k",), bucket_seconds=60,
        open_hi=False,
    )
    assert sorted(r["pt_id"] for r in out2.collect()) == [1, 2, 3, 6]

    # each (point, interval) pair appears exactly once even though the
    # interval covers two buckets
    assert out.count() == out.distinct().count() == 3


def test_range_join_fanout_is_bounded(spark):
    # a 1h interval at 30s buckets -> 121 exploded copies, no more
    intervals = spark.createDataFrame(
        [(1, _ts(0), _ts(3600))], ["iv_id", "lo", "hi"]
    )
    points = spark.range(0).selectExpr(
        "CAST(NULL AS TIMESTAMP) AS ts"
    )
    joined = bucketed_range_join(points, intervals, "ts", "lo", "hi",
                                 bucket_seconds=30)
    # inspect the exploded side size via the interval-only subplan
    exploded = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("lo").cast("long") / 30).cast("long"),
                F.floor(F.col("hi").cast("long") / 30).cast("long"),
            )
        ),
    )
    assert exploded.count() == 121
    assert joined.count() == 0  # no points, and the plan still builds
