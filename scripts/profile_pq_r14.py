"""Round-14 PQ/ADC profile (VERDICT r13 item 6).

knn_pq_rerank (2.8 s) and knn_ivfpq_rerank (3.1 s) are the top
remaining bench queries. The r13 interpreted-HOF finding (~160 µs/row
for Catalyst higher-order functions) suggests their hot paths run
interpreted too:

- ``pq_encode`` → ``_assign_codes``: corpus×M subvector rows, each
  evaluating a transform of K sq-dist HOFs inside array_min
  (corpus × M × K × d_sub interpreted element ops);
- ``adc_topk``: the adist fold is an M-step HOF per joined
  (candidate × query) pair, and the un-pruned pair frame
  (corpus × |queries|) feeds the rank window whole.

This script decomposes the two queries' wall time inside one boot:
encode-only, scan-only (ADC + window, minus rerank), and full query,
each best-of-2 after a warm-up. Verdict criterion: kernel the tier
only if the interpreted-HOF stages cost >30% of the query.

Usage: python scripts/profile_pq_r14.py  (writes PQ_PROFILE_R14.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from website_traffic_etl_gcp_spark import plans  # noqa: E402  (registry)
from website_traffic_etl_gcp_spark.operators import pq  # noqa: E402
from website_traffic_etl_gcp_spark.plans.embeddings import (  # noqa: E402
    EMBED_DIM,
    KNN_K,
    _emb,
    _probe_filter,
)
from website_traffic_etl_gcp_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = 2


def timed(fn) -> float:
    best = None
    for _ in range(REPEATS + 1):  # first run is the warm-up
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("profile-pq-r14")
    spark.sparkContext.setLogLevel("ERROR")

    emb = _emb(spark, SF_DIR)
    q = _probe_filter(emb)
    cents = pq.train_codebooks(emb, EMBED_DIM)
    cents.persist().count()  # codebook training excluded from stages

    stages = {
        # full registry queries (include training + verdict wrapper)
        "knn_pq_rerank_full": lambda: noop(
            plans.REGISTRY["knn_pq_rerank"].builder(spark, SF_DIR)
        ),
        "knn_ivfpq_rerank_full": lambda: noop(
            plans.REGISTRY["knn_ivfpq_rerank"].builder(spark, SF_DIR)
        ),
        # isolated stages on the pre-trained codebook
        "train_codebooks": lambda: noop(
            pq.train_codebooks(emb, EMBED_DIM)
        ),
        "pq_encode_corpus": lambda: noop(
            pq.pq_encode(emb, cents, EMBED_DIM)
        ),
        "adc_scan_topk": lambda: noop(
            pq.adc_topk(emb, q, cents, EMBED_DIM, KNN_K * pq.RERANK_MULT)
        ),
        "adc_rerank_full_op": lambda: noop(
            pq.adc_rerank_topk(emb, q, cents, EMBED_DIM, KNN_K)
        ),
    }
    out = {}
    for name, fn in stages.items():
        out[name] = timed(fn)
        print(f"{name}: {out[name]}s", file=sys.stderr)

    # adc_topk includes pq_encode of the corpus as its scan input —
    # the HOF-dominated stages and their share of the full query
    encode = out["pq_encode_corpus"]
    scan_only = max(0.0, round(out["adc_scan_topk"] - encode, 3))
    full = out["knn_pq_rerank_full"]
    result = {
        "sf_dir": SF_DIR,
        "best_of": REPEATS,
        "sec": out,
        "decomposition": {
            "encode_sec": encode,
            "adc_scan_minus_encode_sec": scan_only,
            "hof_stage_share_of_full_query": round(
                out["adc_scan_topk"] / full, 3
            ),
            "encode_share_of_full_query": round(encode / full, 3),
        },
        "criterion": "kernelize only if interpreted-HOF stages >30% "
        "of the full query (VERDICT r13 item 6)",
    }
    with open(os.path.join(REPO, "PQ_PROFILE_R14.json"), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result["decomposition"]))


if __name__ == "__main__":
    main()
