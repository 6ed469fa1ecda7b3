"""Spot-verify registry queries against their DuckDB oracles at sf1.

The pytest gate pins sf0.001 + sf0.01; this runs the SAME engine-vs-
oracle comparison at the locally derived sf1 (scripts/make_bigdata.py)
for every query whose oracle SQL is tractable for DuckDB at 6M-row
scale — proof that correctness holds at the size the benchmarks run,
not just at test size. Writes CORRECTNESS_SF1.json.

Usage: python scripts/verify_sf1.py [sf_dir] [out_json]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from website_traffic_etl_gcp_spark import plans
from website_traffic_etl_gcp_spark.session import get_spark

# Queries whose oracle SQL stays tractable in DuckDB at sf1 (the
# pair-generating dedup oracles and the recursive closure are
# intentionally excluded — their SQL twins are quadratic-ish shapes
# DuckDB runs at test SFs only).
SF1_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "top_customers_by_revenue",
    "order_priority_counts",
    "etl_traffic_transform",
    "etl_traffic_hourly",
    "etl_traffic_daily_rolling",
    "sessionize_events",
    "daily_active_users",
    "event_type_hourly",
    "error_rate_hourly",
    "rolling_7d_event_volume",
    "dedup_exact",
    "doc_fingerprint",
    "text_token_count",
    "text_quality_score",
    "doc_stats_by_source",
    "doc_chunk_windows",
    "chunk_boilerplate_report",
    "dedup_span_manifest",
    "dedup_span_apply",
    "doc_pack_bins",
    "data_mix_plan",
    "data_mix_sample",
    "export_training_shards",
    "centroid_by_label",
    "embedding_quantize_int8",
    "value_histogram_by_type",
    "customer_balance_deciles",
    # round-5 fingerprint family: window-min / boundary SQL is linear
    # in tokens, tractable at sf1
    "doc_winnow_fingerprints",
    "dedup_winnow_pairs",
    "doc_cdc_chunks",
    "dedup_cdc_span_manifest",
    "dedup_cdc_span_apply",
    "leakage_safe_split",
    "knn_pq_rerank",
    # round-5 selection family: feature/token explodes are linear in
    # corpus tokens, tractable at sf1 (the pair-generating
    # minhash_quality_eval / dup_graph_degree_stats oracles stay
    # test-SF only, same as the other dedup-pair SQL twins)
    "dsir_importance_weights",
    "doc_token_entropy",
    "tokenizer_fertility_by_lang",
    "contrastive_pair_mining",
    # round-6 additions: the occupancy diagnostics' oracles are one
    # corpus×k (or corpus×planes) pass, the ANN/kmeans verdicts are
    # trivial SELECTs, and the reworked semantic dedup's oracle is
    # within-cell pairs over unit-vector CTEs — all linear-ish at sf1.
    # (streaming_semdedup_ingest stays test-SF: its label-only cells
    # make the oracle's odd×even pairwork quadratic in DuckDB.)
    "ivf_cell_occupancy",
    "lsh_bucket_occupancy",
    "dedup_semantic_cells",
    "kmeans_embedding_clusters",
    "kmeans_quality_gate",
    "knn_ivf_cells",
    "knn_ivf_persisted",
    "knn_recall_eval",
    "knn_lsh_bucketed",
    "dsir_gumbel_sample",
    # round-6 second wave: the IVFPQ verdict's oracle is a trivial
    # SELECT, the PCA gate's oracle is one linear moment explode, the
    # waterfill planner's is one token groupBy + O(sources) rounds,
    # and the LM-perplexity oracle is linear in corpus bigrams. (The
    # simhash/winnow quality gates and dedup_keep_best stay test-SF:
    # their exact-Jaccard / recursive-closure truth SQL is the same
    # pairwise work excluded above.)
    "knn_ivfpq_rerank",
    "embedding_pca_gate",
    "token_budget_waterfill",
    "doc_lm_perplexity",
    "knn_ivfpq_persisted",
    "knn_pca_prefilter",
    "streaming_dq_router",
    # unlocked by the directory-layout streaming fix: the whole file-
    # stream tier now runs against the derived sf1 tables; these four
    # have linear window/join oracles tractable at 1M events
    "streaming_hourly_counts",
    "streaming_sessionize",
    "streaming_segment_revenue",
    "streaming_sliding_2h",
    # round-8 additions, unlocked by the list_inner_product oracle
    # rewrite + MATERIALIZED CTEs (the lambda-fold helpers previously
    # made these oracle-cost-prohibitive at sf1 — e.g.
    # dedup_semantic_cells 230.6 s → 1.6 s): the semantic ingest twin,
    # the cell-bounded cosine dedup, brute-force kNN (probe-bounded,
    # corpus-linear), the minhash ingest probe (token-linear), and the
    # exact-fingerprint incremental probe.
    "streaming_semdedup_ingest",
    "embedding_dedup_cosine",
    "knn_bruteforce_cosine",
    "streaming_minhash_ingest",
    "dedup_incremental_exact",
    # late-round-8 additions: the snapshot MERGE family's oracles are
    # one orders aggregate each, the epoch shuffle's is a linear
    # hash + window pass, and the OPQ gate's is a trivial SELECT.
    "snapshot_merge_orders",
    "streaming_cdc_merge_orders",
    "epoch_shuffle_order",
    "embedding_opq_gate",
    "knn_ivf_incremental",
    # chunk-pipeline + stateful-admission oracles are token-linear
    # (the shared chunking CTE / fingerprint equi-joins)
    "rag_chunk_ann_pipeline",
    "streaming_admit_dedup_extend",
    "snapshot_incremental_read",
    "orders_scd2_pit_join",
    "multimodal_dedup_phash",
]

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def frame_hash(df):
    df = df[sorted(df.columns)].round(6)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest(), len(df)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bigdata", "sf1",
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CORRECTNESS_SF1.json",
    )
    spark = get_spark("verify-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        # driver-shipped tables are single files; Spark-derived sf1
        # tables are directories of part files
        p = os.path.join(sf_dir, f"{t}.parquet")
        pat = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')"
        )

    results: dict[str, dict] = {}
    failed = 0
    for name in SF1_QUERIES:
        spec = plans.REGISTRY[name]
        t0 = time.perf_counter()
        try:
            sh, sn = frame_hash(spec.builder(spark, sf_dir).toPandas())
            oh, on = frame_hash(con.execute(spec.oracle).df())
            ok = sh == oh and sn == on
            results[name] = {
                "rows": sn,
                "oracle_rows": on,
                "hash_match": ok,
                "sec": round(time.perf_counter() - t0, 1),
            }
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            ok = False
            results[name] = {"error": str(e)[:300]}
        if not ok:
            failed += 1
        print(f"{name}: {'OK' if ok else 'FAIL'} {results[name]}")

    with open(out_path, "w") as f:
        json.dump(
            {"sf_dir": sf_dir, "n_queries": len(SF1_QUERIES),
             "n_failed": failed, "results": results},
            f, indent=1, sort_keys=True,
        )
    print(f"{len(SF1_QUERIES) - failed}/{len(SF1_QUERIES)} matched -> {out_path}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
