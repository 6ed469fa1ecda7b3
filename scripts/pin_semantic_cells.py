"""Pin the semantic-dedup cell-occupancy claim at a real SF.

``dedup_semantic_cells`` bounds its within-cell pairwork by choosing
the LSH refinement depth p so the EXPECTED cell size stays ≤
SEMDEDUP_CELL_CAP. This script measures that claim at the top of the
measured range (default: the derived sf10 embeddings, 200k vectors):

- the chosen depth and the expected cell size it implies,
- the OBSERVED max / p99 cell occupancy (skew, not just expectation),
- the total within-cell pair count (the actual work the self-join
  does) vs the corpus-quadratic count it replaces.

Writes SEMCELL_PIN_<name>.json and exits non-zero if the expected
cell size exceeds the cap or the observed pairwork is more than
SKEW_BUDGET× the uniform-expectation pairwork (the signal that the
cell scheme — not ambient skew — needs deepening).

Usage: python scripts/pin_semantic_cells.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.plans.embeddings import (
    HOT_CELL_FACTOR,
    SEM_PLANES,
    SEMDEDUP_CELL_CAP,
    _emb,
    semantic_cell_frame,
    skew_refine_cells,
)
from website_traffic_etl_gcp_spark.session import get_spark

# observed total pairwork may exceed the uniform-cells expectation by
# at most this factor before we call the scheme skew-broken
SKEW_BUDGET = 8.0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bigdata", "sf10",
    )
    name = os.path.basename(sf_dir.rstrip("/"))
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"SEMCELL_PIN_{name.upper()}.json",
    )
    spark = get_spark("pin-semantic-cells")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    emb = _emb(spark, sf_dir)
    n, nl = emb.agg(
        F.count(F.lit(1)), F.countDistinct("label")
    ).collect()[0]
    # the engine's own depth rule (integer, mirrors the query)
    p = next(
        (q for q in range(SEM_PLANES + 1)
         if n <= SEMDEDUP_CELL_CAP * nl * (1 << q)),
        SEM_PLANES,
    )
    expected_cell = n / (nl * (1 << p))

    def _occ_stats(frame):
        return (
            frame.groupBy("cell_id")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.count(F.lit(1)).alias("n_cells"),
                F.max("c").alias("max_occ"),
                F.expr("percentile_approx(c, 0.99)").alias("p99_occ"),
                F.avg("c").alias("avg_occ"),
                F.sum(F.expr("c * (c - 1) / 2")).alias("pairs"),
            )
            .collect()[0]
        )

    base = _occ_stats(semantic_cell_frame(emb))
    # the r11 skew-adaptive scheme the query actually runs with
    occ = _occ_stats(skew_refine_cells(semantic_cell_frame(emb, with_sig=True)))
    uniform_pairs = (nl * (1 << p)) * (
        expected_cell * (expected_cell - 1) / 2
    )
    report = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "n_labels": nl,
        "depth_p": p,
        "cell_cap": SEMDEDUP_CELL_CAP,
        "hot_cell_factor": HOT_CELL_FACTOR,
        "expected_cell_size": round(expected_cell, 2),
        "n_cells_nonempty": occ["n_cells"],
        "max_cell_occupancy": occ["max_occ"],
        "p99_cell_occupancy": occ["p99_occ"],
        "avg_cell_occupancy": round(occ["avg_occ"], 2),
        "within_cell_pairs": int(occ["pairs"]),
        "uniform_expectation_pairs": int(uniform_pairs),
        "pairwork_skew_ratio": round(occ["pairs"] / max(uniform_pairs, 1), 3),
        "corpus_quadratic_pairs": n * (n - 1) // 2,
        "pairwork_vs_quadratic": round(
            occ["pairs"] / (n * (n - 1) / 2), 6
        ),
        # the global-depth scheme alone, for before/after comparison
        "base_max_cell_occupancy": base["max_occ"],
        "base_p99_cell_occupancy": base["p99_occ"],
        "base_within_cell_pairs": int(base["pairs"]),
        "wall_sec": round(time.perf_counter() - t0, 1),
    }
    ok = (
        expected_cell <= SEMDEDUP_CELL_CAP
        and report["pairwork_skew_ratio"] <= SKEW_BUDGET
        # the r11 done-bar: no refined cell above the split trigger
        # x expected (integer rule => children land under the line)
        and occ["max_occ"] <= HOT_CELL_FACTOR * expected_cell
    )
    report["within_bounds"] = ok
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report, indent=1, sort_keys=True))
    print(("OK" if ok else "FAIL") + f" -> {out_path}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
