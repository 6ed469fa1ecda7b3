"""Headline benchmark: runs every bench-flagged registry query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Queries are materialized through the noop sink — full distributed
execution, no driver-side collect bottleneck in the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from website_traffic_etl_gcp_spark import plans
from website_traffic_etl_gcp_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = [s for s in plans.REGISTRY.values() if s.bench]
    timings: dict[str, float] = {}
    # JVM JIT + codegen warmup: run the whole suite once at the
    # smallest SF so measured timings reflect steady-state execution,
    # not first-call compilation
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for spec in specs:
            spec.builder(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    for spec in specs:
        t0 = time.perf_counter()
        spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[spec.name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
