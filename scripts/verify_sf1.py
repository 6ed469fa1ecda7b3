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
# Round 9: the sweep is now ALL registry queries minus an explicit
# exclusion list with per-query rationale (SURVEY §5 mirrors it).
# Every exclusion is an oracle-SQL tractability limit in DuckDB at
# 6M-row scale, never an engine limit — the Spark side of each
# excluded query runs fine at sf1 (bench.py covers several).
SF1_EXCLUDED = {
    # exact-Jaccard / pairwise-similarity truth SQL: the oracle
    # generates candidate PAIRS (quadratic-ish shapes kept to test
    # SFs by design; the engine side is df-capped and linear)
    "dedup_ngram_jaccard": "pairwise exact-Jaccard oracle",
    "dedup_jaccard_dfcap": "pairwise exact-Jaccard oracle",
    "dedup_containment_pairs": "pairwise containment oracle",
    "dedup_simhash": "pairwise hamming oracle",
    "dedup_minhash_lsh": "pairwise band-join oracle",
    "dedup_ensemble_pairs": "union of three pairwise oracles",
    "minhash_quality_eval": "pairwise precision/recall truth",
    "simhash_quality_eval": "pairwise precision/recall truth",
    "winnow_quality_eval": "pairwise precision/recall truth",
    "dup_graph_degree_stats": "pairwise edge-set oracle",
    "dup_graph_pagerank": "iterative pagerank over pairwise edges",
    # recursive-CTE connected components over the pair tier
    "dedup_clusters": "recursive closure over pairwise edges",
    "dedup_keep_list": "recursive closure over pairwise edges",
    "dedup_keep_best": "recursive closure over pairwise edges",
    "dedup_incremental_clusters": "recursive closure over pairwise edges",
}

SF1_QUERIES = [n for n in plans.REGISTRY if n not in SF1_EXCLUDED]

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
