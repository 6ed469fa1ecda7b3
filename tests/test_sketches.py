"""Approximate aggregates: sketch error must stay within the declared
bound against the exact answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.catalog import load_table
from website_traffic_etl_gcp_spark.plans.registry import REGISTRY

from .conftest import SF_DIR


def test_hll_within_error_bound(spark):
    approx = REGISTRY["approx_distinct_users_daily"].builder(spark, SF_DIR)
    exact = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("dau"))
    )
    joined = approx.join(exact, "day").collect()
    assert joined, "no days compared"
    for r in joined:
        rel_err = abs(r["approx_dau"] - r["dau"]) / max(r["dau"], 1)
        assert rel_err <= 0.10, f"{r['day']}: HLL off by {rel_err:.1%}"
