"""Approximate aggregates: sketch error must stay within the declared
bound against the exact answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.catalog import load_table
from website_traffic_etl_gcp_spark.plans.registry import REGISTRY

from .conftest import SF_DIR


def test_hll_within_error_bound(spark):
    """The registry query emits its own error-bound verdict per day
    (approx_ok = |HLL − exact| ≤ 5%·exact); the independent exact
    count here confirms dau_exact and that every day passes."""
    approx = REGISTRY["approx_distinct_users_daily"].builder(spark, SF_DIR)
    exact = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("dau"))
    )
    joined = approx.join(exact, "day").collect()
    assert joined, "no days compared"
    for r in joined:
        assert r["dau_exact"] == r["dau"]
        assert r["approx_ok"], f"{r['day']}: HLL outside the 5% bound"


def test_percentile_verdicts_all_true(spark):
    """The registry query emits rank-error verdicts per event type;
    every row must be all-TRUE with n_values matching the data."""
    rows = REGISTRY["value_percentiles_approx"].builder(spark, SF_DIR).collect()
    assert rows, "no event types"
    for r in rows:
        assert r["n_values"] > 0
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"], r


def test_approx_percentiles_within_rank_error(spark):
    raw = (
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("p"))
        .collect()
    )
    approx = {r["event_type"]: tuple(r["p"]) for r in raw}
    ev = load_table(spark, SF_DIR, "events").filter(F.col("value").isNotNull())
    for etype, (p50, p90, p99) in approx.items():
        vals = sorted(
            r["value"] for r in ev.filter(F.col("event_type") == etype).collect()
        )
        n = len(vals)
        for q, got in ((0.5, p50), (0.9, p90), (0.99, p99)):
            # rank error: the approx value's rank must be within 1% of
            # the target rank (accuracy=10000 guarantees 1/10000, the
            # slack covers duplicate values)
            import bisect

            lo = bisect.bisect_left(vals, got)
            hi = bisect.bisect_right(vals, got)
            target = q * (n - 1)
            assert lo - 0.01 * n <= target <= hi + 0.01 * n, (
                f"{etype} q={q}: value {got} rank [{lo},{hi}] vs target {target}"
            )


def test_percentile_verdict_true_on_all_null_group(spark, tmp_path):
    """An event_type whose every value is NULL has n=0 → eps = Inf and
    NULL comparisons; the verdict must coalesce to TRUE (vacuously
    met bound) to match the oracle's hard-coded TRUE — not surface
    NULL booleans. Planted here because the shipped testdata never
    produces such a group."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from website_traffic_etl_gcp_spark.catalog import TABLES, table_path

    ev = pq.read_table(table_path(SF_DIR, "events"))
    null_rows = ev.slice(0, 5)
    i_type = ev.schema.get_field_index("event_type")
    i_val = ev.schema.get_field_index("value")
    null_rows = null_rows.set_column(
        i_type,
        "event_type",
        pa.array(["__all_null__"] * 5, ev.schema.field("event_type").type),
    )
    null_rows = null_rows.set_column(
        i_val,
        "value",
        pa.array([None] * 5, ev.schema.field("value").type),
    )
    d = tmp_path / "sf_nullgroup"
    d.mkdir()
    pq.write_table(pa.concat_tables([ev, null_rows]), str(d / "events.parquet"))
    for t in TABLES:
        if t != "events":
            os.symlink(table_path(SF_DIR, t), str(d / f"{t}.parquet"))

    rows = {
        r["event_type"]: r
        for r in REGISTRY["value_percentiles_approx"].builder(spark, str(d)).collect()
    }
    planted = rows["__all_null__"]
    assert planted["n_values"] == 0
    assert planted["p50_ok"] is True
    assert planted["p90_ok"] is True
    assert planted["p99_ok"] is True
    for r in rows.values():
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"]
