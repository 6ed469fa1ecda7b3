"""Spot-verify registry queries against their DuckDB oracles at sf10.

The pytest gate pins sf0.001 + sf0.01, the sf1 sweep covers all 179
queries; this pushes an INCLUSION list of queries whose oracle SQL is
linear-ish (aggregates, rollups, joins — no pairwise shapes) to the
top of the measured range: sf10 = 60M-row lineitem / 10M events /
500k docs / 200k vectors, 100× the test SF. Proof that correctness
holds at the largest locally-derived scale, not just where the tests
run. Writes CORRECTNESS_SF10.json.

Usage: python scripts/verify_sf10.py [sf_dir] [out_json] [only,csv]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from website_traffic_etl_gcp_spark import plans
from website_traffic_etl_gcp_spark.session import get_spark
from verify_sf1 import TABLES, _table_pattern, frame_hash, run_one  # noqa: E402

# Linear-oracle queries spanning every §2 section. Chosen for DuckDB
# tractability at 60M rows (aggregate / join / window shapes); the
# pairwise and closure families have their sampled-frame sf1 rows.
SF10_QUERIES = [
    # §2A ETL
    "etl_traffic_transform",
    "etl_traffic_hourly",
    "incremental_hourly_rollup",
    # §2B relational (TPC-H shapes over 60M lineitem)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_nation_profit",
    "q18_large_volume_customers",
    "top_customers_by_revenue",
    # §2C events (10M rows)
    "daily_active_users",
    "sessionize_events",
    "error_rate_hourly",
    "rolling_7d_event_volume",
    # §2D documents (500k docs)
    "dedup_exact",
    "doc_stats_by_source",
    "text_token_count",
    "lang_id_heuristic",
    "doc_fingerprint",
    "top_bigrams",
    "dsir_importance_weights",
    "doc_lm_perplexity",
    "text_extract_html",
    "text_extract_html_quality",
    # round 12: web/tokenizer/LM families (linear oracles)
    "url_canonicalize",
    "domain_quality_rollup",
    "domain_cap_sample",
    "web_prefilter_chain",
    "streaming_web_prefilter",
    "trigram_kn_prob",
    "doc_lm_perplexity_tri",
    "bpe_train_merges",
    "unigram_lm_segment",
    "unigram_lm_train",
    "unigram_lm_refine",
    "tokenizer_compare",
    # round 13: the rest of the MUST_LEAD_R13 window head whose
    # oracles are sf10-tractable (linear scans, probe-bounded ANN
    # verdicts, hash-equality joins — the pairwise/closure shapes
    # keep their sampled-frame sf1 rows instead)
    "bpe_fertility_by_lang",
    "bigram_kn_prob",
    "bm25_doc_retrieval",
    "chunk_boilerplate_report",
    "data_mix_plan",
    "data_mix_sample",
    "doc_chunk_windows",
    "doc_token_entropy",
    "epoch_shuffle_order",
    "export_training_shards",
    "funnel_conversion",
    "retention_cohorts",
    "kmeans_embedding_clusters",
    "kmeans_quality_gate",
    "knn_lsh_bucketed",
    "knn_recall_eval",
    "knn_ivf_incremental",
    "embedding_opq_gate",
    "multimodal_audio_chunks",
    "multimodal_frame_sample",
    "multimodal_png_metadata",
    "multimodal_resize_dims",
    "orders_scd2_pit_join",
    # §2E embeddings (200k vectors)
    "centroid_by_label",
    "embedding_quantize_int8",
    "ivf_cell_occupancy",
    # §2E2 advanced
    "value_percentiles_approx",
    "salted_event_value_sum",
    "revenue_rollup_nation_year",
    # §2F/§2G/§2H
    "multimodal_metadata",
    "multimodal_video_frames",
    "streaming_hourly_counts",
    "streaming_bus_ingest",
    "streaming_bus_dlq_audit",
    "streaming_html_extract",
    "snapshot_zonemap_prune",
    # round 14: the rest of the MUST_LEAD_R14 window whose oracles
    # are sf10-tractable (relational shapes, probe-bounded ANN
    # verdicts, capped lakehouse fixtures, bounded streaming drains —
    # the pairwise dedup/graph families keep their sampled-frame sf1
    # rows), plus the r14 bench cohort and the kernelized PQ tier
    "knn_bruteforce_cosine",
    "streaming_admit_dedup_extend",
    "streaming_wav_chunks",
    "xls_extract_transform",
    "approx_distinct_users_daily",
    "customers_above_segment_avg",
    "dsir_gumbel_sample",
    "embedding_pca_gate",
    "etl_gcs_end_to_end",
    "knn_ivf_cells",
    "knn_pca_prefilter",
    "lang_source_matrix",
    "lsh_bucket_occupancy",
    "q2_min_cost_supplier",
    "q4_late_shipment_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q11_important_parts",
    "returned_items_report",
    "salted_orderstatus_revenue",
    "signup_to_purchase_latency",
    "snapshot_history_audit",
    "snapshot_incremental_read",
    "snapshot_merge_orders",
    "snapshot_zorder_prune",
    "streaming_cdc_merge_orders",
    "streaming_dq_router",
    "streaming_video_frames",
    "token_budget_waterfill",
    "tokenizer_fertility_by_lang",
    "asof_last_event_before_order",
    "order_cube_status_priority",
    "value_trimmed_stats_by_type",
    "bloom_prefiltered_revenue",
    "customer_balance_deciles",
    "top_terms_tfidf",
    "doc_repetition_score",
    "unicode_nfc_normalize",
    "leakage_safe_split",
    "knn_pq_rerank",
    "knn_ivfpq_rerank",
    "knn_ivfpq_persisted",
    # round 14 wave 8/9: the zero-shuffle winnow/CDC kernels — their
    # linear oracles (the winnow/CDC CTEs) are sf10-tractable
    "doc_winnow_fingerprints",
    "doc_cdc_chunks",
    # round 14 wave 12: the remaining linear-oracle relational/events/
    # ETL rows (aggregate/join/window shapes; the pairwise dedup,
    # graph-closure, and heavyweight-CTE families stay on their
    # sampled-frame sf1 rows)
    "nation_revenue_yearly",
    "order_priority_counts",
    "part_type_revenue_share",
    "q12_priority_by_status",
    "q13_customer_order_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_supplier_part_variety",
    "q17_small_quantity_revenue",
    "q19_brand_quantity_revenue",
    "q20_excess_availability",
    "q22_dormant_accounts",
    "event_type_hourly",
    "session_window_rollup",
    "session_bounce_rate",
    "top_users_by_purchase",
    "users_without_purchase",
    "user_purchase_gaps",
    "props_json_extract",
    "value_histogram_by_type",
    "etl_traffic_quarantine",
    "etl_traffic_daily_rolling",
]


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, ".bigdata", "sf10"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, "CORRECTNESS_SF10.json"
    )
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    spark = get_spark("verify-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{_table_pattern(sf_dir, t)}')"
        )
    results: dict[str, dict] = {}
    failed = 0
    for name in SF10_QUERIES:
        if only and name not in only:
            continue
        try:
            results[name] = run_one(spark, con, plans.REGISTRY[name], sf_dir)
            ok = results[name]["hash_match"]
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            ok = False
            results[name] = {"error": str(e)[:300]}
        if not ok:
            failed += 1
        print(f"{name}: {'OK' if ok else 'FAIL'} {results[name]}", flush=True)
    n = len(results)
    # an `only` run MERGES into the existing artifact (late-landing
    # queries appended); a full run replaces it wholesale
    if only and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f).get("results", {})
        prior.update(results)
        results = prior
        failed = sum(
            1 for r in results.values() if not r.get("hash_match", False)
        )
        n = len(results)
    with open(out_path, "w") as f:
        json.dump(
            {"sf_dir": sf_dir, "n_queries": n, "n_failed": failed,
             "results": results},
            f, indent=1, sort_keys=True,
        )
    print(f"{n - failed}/{n} matched -> {out_path}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
