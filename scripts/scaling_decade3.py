"""Third-decade scaling evidence: the FULL headline suite at sf1 →
sf10 in one boot.

BENCH_SCALING covers sf0.1→sf1 for the whole suite and
BENCH_SCALING2 covers sf1→sf10 for the prior worst-5 only; this run
gives every bench-flagged query a measured second decade, completing
a 100× cumulative story (sf0.1 → sf10) per query. Same method as the
other decades: warm both paths (file cache, codegen, persisted index
builds at measurement SF), best-of-2, noop sink, single boot so
ratios cancel ambient VM drift. Writes BENCH_SCALING3.json.

Usage: python scripts/scaling_decade3.py [lo_dir] [hi_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from website_traffic_etl_gcp_spark import plans
from website_traffic_etl_gcp_spark.session import get_spark


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
            # queries persist() intermediates and never unpersist (the
            # frame dies with the query in production); across 4 passes
            # × the whole suite at sf10 those cached partitions starve
            # the unified pool until a broadcast build OOMs. Each run
            # re-persists what it needs, so clearing between runs
            # changes no measurement — on-disk index scratch survives.
            spark.catalog.clearCache()
        out[name] = round(best, 3)
        print(f"{sf_dir.rsplit('/', 1)[-1]} {name}: {out[name]}s", flush=True)
    return out


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lo = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, ".bigdata", "sf1"
    )
    hi = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, ".bigdata", "sf10"
    )
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        repo, "BENCH_SCALING3.json"
    )
    names = [n for n, s in plans.REGISTRY.items() if s.bench]
    spark = get_spark("scaling-decade3")
    spark.sparkContext.setLogLevel("ERROR")
    for d in (lo, hi):  # warm file cache + codegen + index builds
        _run(spark, names, d, repeats=1)
    lo_t = _run(spark, names, lo)
    hi_t = _run(spark, names, hi)
    ratios = {
        n: round(hi_t[n] / lo_t[n], 2) if lo_t[n] > 0 else None for n in lo_t
    }
    out = {
        "sf_lo": 1.0,
        "sf_hi": 10.0,
        "data_ratio": 10.0,
        "n_queries": len(names),
        "cumulative_span": "sf0.1 -> sf10 (100x) with BENCH_SCALING.json",
        "sec_lo": lo_t,
        "sec_hi": hi_t,
        "time_ratio": ratios,
        "superlinear": sorted(n for n, r in ratios.items() if r and r > 10.0),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
