"""Second-decade scaling evidence: sf1 → sf10 for the queries with the
WORST sf0.1→sf1 wall-clock ratios (BENCH_SCALING.json top-5).

One decade of sub-linear growth can hide a super-linear term that only
dominates later; measuring the worst scalers across a second 10× step
gives a 100× cumulative span (sf0.1 → sf10). Same method as
``bench.py --scaling``: warm both paths, best-of-2, noop sink, ratio
vs the 10× data ratio. Writes BENCH_SCALING2.json.

Usage: python scripts/scaling_decade2.py [lo_dir] [hi_dir]
(defaults: <repo>/.bigdata/sf1 and <repo>/.bigdata/sf10 — generate
the latter with
``SPARK_GRAFT_BIGDATA_TABLES=... python scripts/make_bigdata.py
.bigdata/sf1 .bigdata/sf10 1000000000``)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from website_traffic_etl_gcp_spark import plans
from website_traffic_etl_gcp_spark.session import get_spark

# the five worst sf0.1→sf1 ratios from BENCH_SCALING.json (r8 run):
# dedup_semantic_cells 3.93, q5_local_supplier_volume 3.63,
# doc_pack_bins 3.26, knn_pq_rerank 3.20, q3_shipping_priority 3.15
WORST_SCALERS = [
    "dedup_semantic_cells",
    "q5_local_supplier_volume",
    "doc_pack_bins",
    "knn_pq_rerank",
    "q3_shipping_priority",
]


def _run(spark, names, sf_dir, repeats=2):
    out = {}
    for name in names:
        spec = plans.REGISTRY[name]
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lo = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, ".bigdata", "sf1"
    )
    hi = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, ".bigdata", "sf10"
    )
    spark = get_spark("scaling-decade2")
    spark.sparkContext.setLogLevel("ERROR")
    for d in (lo, hi):  # warm file cache + codegen + index builds
        _run(spark, WORST_SCALERS, d, repeats=1)
    lo_t = _run(spark, WORST_SCALERS, lo)
    hi_t = _run(spark, WORST_SCALERS, hi)
    ratios = {
        n: round(hi_t[n] / lo_t[n], 2) if lo_t[n] > 0 else None for n in lo_t
    }
    out = {
        "sf_lo": 1.0,
        "sf_hi": 10.0,
        "data_ratio": 10.0,
        "cumulative_span": "sf0.1 -> sf10 (100x) with BENCH_SCALING.json",
        "sec_lo": lo_t,
        "sec_hi": hi_t,
        "time_ratio": ratios,
        "superlinear": sorted(n for n, r in ratios.items() if r and r > 10.0),
    }
    path = os.path.join(repo, "BENCH_SCALING2.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
