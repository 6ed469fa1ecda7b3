"""Same-boot A/B of r10 HEAD vs r12 HEAD on dedup_semantic_cells.

The r12 bench flagged this query at 1.52x family-drift-normalized over
its rolling best (2.501s vs 1.197s). The 1.197s best PREDATES the r11
hot-cell split (plans/embeddings.py:811), whose cost the r11 round
measured at ~1.15x vs the r10 tree but never saved as a standalone
artifact — so the flag keeps re-firing against a best the current
(deliberately more skew-robust) plan is not supposed to reach. This
script makes the structural cost a pinned, citable number with the
established paired design inside ONE Spark boot (alternating arm order
per rep so ambient VM load hits both arms equally).

Companion control queries from the same embeddings tier, untouched
since r10, separate a code regression from family-wide ambient drift:
if the target moves WITH the controls, the drift is ambient; the
target/control ratio spread is the structural cost of the split.

Usage: python scripts/ab_semcells_r12.py   (writes SEMCELL_AB_R12.json)
"""

from __future__ import annotations

import importlib
import json
import os
import statistics
import sys
import time

TREE_A = os.environ.get("AB_TREE_A", "/tmp/ab_r10")  # r10 HEAD 5fca5a2
TREE_B = os.environ.get("AB_TREE_B", "/root/repo")  # r12 working HEAD
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("AB_REPEATS", "4"))

TARGET = "dedup_semantic_cells"
CONTROLS = ["embedding_dedup_cosine", "knn_bruteforce_cosine"]
QUERIES = [TARGET] + CONTROLS

PKG = "website_traffic_etl_gcp_spark"


def _load_registry(tree: str):
    for mod in [m for m in sys.modules if m.startswith(PKG)]:
        del sys.modules[mod]
    sys.path = [p for p in sys.path if p not in (TREE_A, TREE_B, "/root/repo")]
    sys.path.insert(0, tree)
    plans = importlib.import_module(f"{PKG}.plans")
    return plans.REGISTRY


def _run_one(registry, spark, name) -> float:
    t0 = time.perf_counter()
    registry[name].builder(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sys.path.insert(0, TREE_B)
    from website_traffic_etl_gcp_spark.session import get_spark

    spark = get_spark("ab-semcells-r12")
    arms = (("A_r10", TREE_A), ("B_r12", TREE_B))

    meas: dict[str, dict[str, list[float]]] = {
        label: {n: [] for n in QUERIES} for label, _ in arms
    }

    for label, tree in arms:  # warm-up: file cache + codegen per arm
        reg = _load_registry(tree)
        for n in QUERIES:
            _run_one(reg, spark, n)
        print(f"warm-up {label} done", file=sys.stderr)

    for rep in range(REPEATS):
        order = arms if rep % 2 == 0 else tuple(reversed(arms))
        for label, tree in order:
            reg = _load_registry(tree)
            spark.catalog.clearCache()
            for n in QUERIES:
                meas[label][n].append(_run_one(reg, spark, n))
            print(f"rep {rep} {label} done", file=sys.stderr)

    med = {
        label: {n: round(statistics.median(v), 3) for n, v in qs.items()}
        for label, qs in meas.items()
    }
    ratios = {
        n: round(med["B_r12"][n] / med["A_r10"][n], 3) for n in QUERIES
    }
    result = {
        "sf_dir": SF_DIR,
        "repeats": REPEATS,
        "design": "paired same-boot A/B, alternating arm order per rep, "
        "1 warm-up pass per arm, clearCache before each measured rep",
        "commit_a": "5fca5a2 (r10 HEAD, pre hot-cell split)",
        "commit_b": "r12 working HEAD",
        "target": TARGET,
        "controls": CONTROLS,
        "median_sec": med,
        "ratio_b_over_a": ratios,
        "structural_cost_vs_controls": round(
            ratios[TARGET]
            / statistics.median([ratios[n] for n in CONTROLS]),
            3,
        ),
        "raw": meas,
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SEMCELL_AB_R12.json",
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "target_ratio": ratios[TARGET],
                "control_ratios": {n: ratios[n] for n in CONTROLS},
                "structural_cost_vs_controls": result[
                    "structural_cost_vs_controls"
                ],
                "median_sec": {
                    label: med[label][TARGET] for label in med
                },
            }
        )
    )


if __name__ == "__main__":
    main()
