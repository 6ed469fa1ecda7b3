"""Same-boot paired A/B of the r13 skew-split rewrite.

Arm A = commit 896f95e (per-round corpus re-key + localCheckpoint —
the r11 split shape); Arm B = working HEAD (bounded (lbase, sig)
group simulation + ONE broadcast corpus re-key). Targets are the two
consumers of skew_refine_cells at sf0.1 AND sf1 (sf1 exercises the
actual split: hot cells exist there), with q1_pricing_summary as the
global ambient anchor.

Usage: python scripts/ab_semcell_split_r13.py  (writes SEMCELL_AB_R13.json)
"""

from __future__ import annotations

import importlib
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TREE_A = os.environ.get("AB_TREE_A", "/tmp/ab13_pre")
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".bigdata/sf1")
REPEATS = int(os.environ.get("AB_REPEATS", "4"))
QUERIES = ["dedup_semantic_cells", "embedding_dedup_cosine", "q1_pricing_summary"]
PKG = "website_traffic_etl_gcp_spark"


def _load_registry(tree: str):
    for mod in [m for m in sys.modules if m.startswith(PKG)]:
        del sys.modules[mod]
    sys.path = [p for p in sys.path if p not in (TREE_A, REPO)]
    sys.path.insert(0, tree)
    return importlib.import_module(f"{PKG}.plans").REGISTRY


def _run(reg, spark, name, sf_dir) -> float:
    t0 = time.perf_counter()
    reg[name].builder(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sys.path.insert(0, REPO)
    from website_traffic_etl_gcp_spark.session import get_spark

    spark = get_spark("ab-semcell-split-r13")
    arms = (("A_pre", TREE_A), ("B_new", REPO))
    meas = {
        lbl: {sf: {n: [] for n in QUERIES} for sf in ("sf0.1", "sf1")}
        for lbl, _ in arms
    }
    for lbl, tree in arms:  # warm-up both SFs per arm
        reg = _load_registry(tree)
        for sf_lbl, sf in (("sf0.1", SF01), ("sf1", SF1)):
            for n in QUERIES:
                _run(reg, spark, n, sf)
        print(f"warm-up {lbl} done", file=sys.stderr)
    for rep in range(REPEATS):
        order = arms if rep % 2 == 0 else tuple(reversed(arms))
        for lbl, tree in order:
            reg = _load_registry(tree)
            spark.catalog.clearCache()
            for sf_lbl, sf in (("sf0.1", SF01), ("sf1", SF1)):
                for n in QUERIES:
                    meas[lbl][sf_lbl][n].append(_run(reg, spark, n, sf))
            print(f"rep {rep} {lbl} done", file=sys.stderr)
    med = {
        lbl: {
            sf: {n: round(statistics.median(v), 3) for n, v in qs.items()}
            for sf, qs in sfs.items()
        }
        for lbl, sfs in meas.items()
    }
    ratios = {
        sf: {
            n: round(med["B_new"][sf][n] / med["A_pre"][sf][n], 3)
            for n in QUERIES
        }
        for sf in ("sf0.1", "sf1")
    }
    result = {
        "design": "paired same-boot A/B, alternating arm order per rep, "
        "1 warm-up pass per arm+SF, clearCache before each measured rep",
        "arm_a": "896f95e (per-round corpus re-key split)",
        "arm_b": "r13 working HEAD (bounded-group driver sim + one "
        "broadcast re-key)",
        "repeats": REPEATS,
        "median_sec": med,
        "ratio_new_over_pre": ratios,
        "raw": meas,
    }
    with open(os.path.join(REPO, "SEMCELL_AB_R13.json"), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps({"median_sec": med, "ratio_new_over_pre": ratios}, indent=1))


if __name__ == "__main__":
    main()
