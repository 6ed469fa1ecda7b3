"""Same-boot A/B of r10 HEAD vs r11 HEAD on dedup_incremental_minhash.

The r11 bench flagged this query at 2.63x raw / 2.10x drift-normalized
over its rolling best, and the round closed without adjudicating it.
This script settles the flag with the established paired design inside
ONE Spark boot (scripts/ab_dedup_tier_r11.py pattern): the two code
trees (git worktrees pinned at the round-10 and round-11 verdict
commits) alternate A/B/B/A, so ambient VM load hits both arms equally
and the per-query ratio isolates the code change.

Two measured paths per arm, per the r11 verdict's ask:

* ``warm`` — the steady-state probe against the PERSISTED bucketed
  band/signature index, run under ``SPARK_GRAFT_STRICT_INDEX=1`` so a
  silent fallback to the in-query derivation (which would double the
  work and explain a 2x reading) fails loudly instead of skewing the
  timing.  ``spark.catalog.clearCache()`` precedes every measured rep
  so neither arm rides the other's persisted-DataFrame cache.
* ``cold`` — the first-touch index build + probe with a FRESH
  ``WTES_INDEX_DIR`` per rep, because the query's bench history shows
  first-touch builds reading ~4x over steady state and being mistaken
  for regressions (the r7 6.2 s flag).

Companion control queries (same dedup tier, untouched by the r11
scratch/bus work) separate a code regression from family-wide ambient
drift: if the incremental query moves WITH the controls, it's ambient.

Usage: python scripts/ab_incr_minhash_r12.py   (writes DEDUP_AB_R12.json)
"""

from __future__ import annotations

import importlib
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

TREE_A = os.environ.get("AB_TREE_A", "/tmp/ab_r10")  # r10 HEAD 5fca5a2
TREE_B = os.environ.get("AB_TREE_B", "/tmp/ab_r11")  # r11 HEAD 7e3d324
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("AB_REPEATS", "4"))

TARGET = "dedup_incremental_minhash"
CONTROLS = ["dedup_minhash_lsh", "dedup_incremental_exact", "dedup_exact"]
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

    spark = get_spark("ab-incr-minhash-r12")
    arms = (("A_r10", TREE_A), ("B_r11", TREE_B))

    warm: dict[str, dict[str, list[float]]] = {
        label: {n: [] for n in QUERIES} for label, _ in arms
    }
    cold: dict[str, list[float]] = {label: [] for label, _ in arms}

    # warm-up: one full pass per arm builds each arm's persisted index
    # (content-keyed shared root) and touches the file cache / codegen
    for label, tree in arms:
        reg = _load_registry(tree)
        for n in QUERIES:
            _run_one(reg, spark, n)
        print(f"warm-up {label} done", file=sys.stderr)

    # measured warm probes: STRICT so a fallback-to-in-query (the
    # suspected failure mode) aborts rather than silently inflating
    os.environ["SPARK_GRAFT_STRICT_INDEX"] = "1"
    try:
        for rep in range(REPEATS):
            order = arms if rep % 2 == 0 else tuple(reversed(arms))
            for label, tree in order:
                reg = _load_registry(tree)
                spark.catalog.clearCache()
                for n in QUERIES:
                    warm[label][n].append(_run_one(reg, spark, n))
                print(f"warm rep {rep} {label} done", file=sys.stderr)
    finally:
        del os.environ["SPARK_GRAFT_STRICT_INDEX"]

    # measured cold builds: fresh index root per rep, target query only
    for rep in range(2):
        order = arms if rep % 2 == 0 else tuple(reversed(arms))
        for label, tree in order:
            reg = _load_registry(tree)
            spark.catalog.clearCache()
            tmp = tempfile.mkdtemp(prefix=f"abidx_{label}_")
            os.environ["WTES_INDEX_DIR"] = tmp
            try:
                cold[label].append(_run_one(reg, spark, TARGET))
            finally:
                del os.environ["WTES_INDEX_DIR"]
                shutil.rmtree(tmp, ignore_errors=True)
            print(f"cold rep {rep} {label} done", file=sys.stderr)

    med = {
        label: {n: round(statistics.median(v), 3) for n, v in qs.items()}
        for label, qs in warm.items()
    }
    ratios = {
        n: round(med["B_r11"][n] / med["A_r10"][n], 3) for n in QUERIES
    }
    cold_med = {
        label: round(statistics.median(v), 3) for label, v in cold.items()
    }
    result = {
        "sf_dir": SF_DIR,
        "repeats_warm": REPEATS,
        "repeats_cold": 2,
        "design": "paired same-boot A/B, alternating arm order per rep, "
        "1 warm-up pass per arm, clearCache before each measured rep, "
        "SPARK_GRAFT_STRICT_INDEX=1 on warm reps, fresh WTES_INDEX_DIR "
        "per cold rep",
        "commit_a": "5fca5a2 (r10 HEAD)",
        "commit_b": "7e3d324 (r11 HEAD)",
        "target": TARGET,
        "controls": CONTROLS,
        "median_warm_sec": med,
        "ratio_b_over_a_warm": ratios,
        "median_cold_build_sec": cold_med,
        "ratio_b_over_a_cold": round(
            cold_med["B_r11"] / cold_med["A_r10"], 3
        ),
        "raw_warm": warm,
        "raw_cold": cold,
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DEDUP_AB_R12.json",
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "target_warm_ratio": ratios[TARGET],
                "control_warm_ratios": {n: ratios[n] for n in CONTROLS},
                "cold_ratio": result["ratio_b_over_a_cold"],
                "median_warm_sec": {
                    label: med[label][TARGET] for label in med
                },
            }
        )
    )


if __name__ == "__main__":
    main()
