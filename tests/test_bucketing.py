"""Bucketed-layout guarantee: joining two tables bucketed on the join
key must produce a plan with NO shuffle exchange — the whole point of
paying the bucketed write once."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.catalog import load_table
from website_traffic_etl_gcp_spark.sources import bucketing

from .conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark):
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    bucketing.write_bucketed(orders, "b_orders", "o_orderkey", sort_col="o_orderkey")
    bucketing.write_bucketed(
        lineitem, "b_lineitem", "l_orderkey", sort_col="l_orderkey"
    )

    # disable broadcast so the planner must choose between shuffled and
    # bucketed SMJ — at 100 TB neither side is broadcastable anyway
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.bucketed_join(
            spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join still shuffles:\n{plan}"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and the result is correct
    expected = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert joined.count() == expected

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
