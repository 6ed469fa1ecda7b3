"""Round-13 perf adjudication: one same-boot paired A/B settling every
standing r12 bench flag (VERDICT r12 items 3-5).

Targets and arms (all inside ONE Spark boot, alternating arm order per
rep so ambient VM load hits every arm equally):

- ``dedup_semantic_cells``: r10 HEAD (5fca5a2, pre hot-cell split) vs
  r13 working HEAD, at sf0.1 AND sf1 — the r12 verdict confirmed two
  independent readings above the 2.9 s adjudicated ceiling and asked
  for the paired re-measure at both SFs.
- ``knn_ivf_cells``: r11 HEAD (7e3d324) vs r13 working HEAD — drifted
  r11 1.99 s → r12 driver 2.68 s → judge same-boot 3.48 s with no
  ledger entry; the verdict asked for the DEDUP_AB_R12 treatment.
  (No SPARK_GRAFT_STRICT_INDEX: this is the in-query IVF tier — it
  derives its cells per run and never touches the persisted index.)
- current-tree triplicates for the noise-dominated sub-second flags
  (``knn_bruteforce_cosine``, ``ivf_cell_occupancy``,
  ``lsh_bucket_occupancy``, ``dsir_importance_weights``) so their
  ledger entries stop churning driver verdicts.

Anchors measured on EVERY arm: ``knn_bruteforce_cosine`` (embeddings
family) and ``q1_pricing_summary`` (global) — they separate a code
regression (target moves, anchors don't) from ambient drift (both
move together).

Usage: python scripts/ab_perf_r13.py    (writes PERF_AB_R13.json)
Assumes git worktrees at /tmp/ab13_r10 (5fca5a2) and /tmp/ab13_r11
(7e3d324); creates them if missing.
"""

from __future__ import annotations

import importlib
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TREE_R10 = os.environ.get("AB_TREE_R10", "/tmp/ab13_r10")
TREE_R11 = os.environ.get("AB_TREE_R11", "/tmp/ab13_r11")
COMMIT_R10 = "5fca5a2"
COMMIT_R11 = "7e3d324"
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(REPO, ".bigdata/sf1"))
REPEATS = int(os.environ.get("AB_REPEATS", "4"))

ANCHORS = ["knn_bruteforce_cosine", "q1_pricing_summary"]
TRIPLICATE = [
    "knn_bruteforce_cosine",
    "ivf_cell_occupancy",
    "lsh_bucket_occupancy",
    "dsir_importance_weights",
]

PKG = "website_traffic_etl_gcp_spark"

# arm label -> (tree path, queries measured on that arm at sf0.1)
ARMS = {
    "r10": (TREE_R10, ["dedup_semantic_cells"] + ANCHORS),
    "r11": (TREE_R11, ["knn_ivf_cells"] + ANCHORS),
    "r13": (
        REPO,
        sorted(
            set(
                ["dedup_semantic_cells", "knn_ivf_cells"]
                + ANCHORS
                + TRIPLICATE
            )
        ),
    ),
}


def _ensure_worktree(path: str, commit: str) -> None:
    if os.path.isdir(os.path.join(path, PKG)):
        return
    subprocess.run(
        ["git", "worktree", "add", "--detach", path, commit],
        cwd=REPO,
        check=True,
    )


def _load_registry(tree: str):
    for mod in [m for m in sys.modules if m.startswith(PKG)]:
        del sys.modules[mod]
    trees = {TREE_R10, TREE_R11, REPO}
    sys.path = [p for p in sys.path if p not in trees]
    sys.path.insert(0, tree)
    plans = importlib.import_module(f"{PKG}.plans")
    return plans.REGISTRY


def _run_one(registry, spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    registry[name].builder(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    _ensure_worktree(TREE_R10, COMMIT_R10)
    _ensure_worktree(TREE_R11, COMMIT_R11)

    sys.path.insert(0, REPO)
    from website_traffic_etl_gcp_spark.session import get_spark

    spark = get_spark("ab-perf-r13")
    arm_items = list(ARMS.items())

    meas: dict[str, dict[str, list[float]]] = {
        label: {n: [] for n in qs} for label, (_, qs) in arm_items
    }

    for label, (tree, qs) in arm_items:  # warm-up: file cache + codegen
        reg = _load_registry(tree)
        for n in qs:
            _run_one(reg, spark, n, SF01)
        print(f"warm-up {label} done", file=sys.stderr)

    for rep in range(REPEATS):
        order = arm_items if rep % 2 == 0 else list(reversed(arm_items))
        for label, (tree, qs) in order:
            reg = _load_registry(tree)
            spark.catalog.clearCache()
            for n in qs:
                meas[label][n].append(_run_one(reg, spark, n, SF01))
            print(f"rep {rep} {label} done", file=sys.stderr)

    med = {
        label: {n: round(statistics.median(v), 3) for n, v in qs.items()}
        for label, qs in meas.items()
    }

    # ---- sf1 pass for dedup_semantic_cells (verdict asked for both SFs)
    sf1 = {"r10": [], "r13": []}
    if os.path.isdir(SF1):
        for label, tree in (("r10", TREE_R10), ("r13", REPO)):  # warm
            reg = _load_registry(tree)
            _run_one(reg, spark, "dedup_semantic_cells", SF1)
        for rep in range(2):
            pairs = (
                [("r10", TREE_R10), ("r13", REPO)]
                if rep % 2 == 0
                else [("r13", REPO), ("r10", TREE_R10)]
            )
            for label, tree in pairs:
                reg = _load_registry(tree)
                spark.catalog.clearCache()
                sf1[label].append(
                    _run_one(reg, spark, "dedup_semantic_cells", SF1)
                )
                print(f"sf1 rep {rep} {label} done", file=sys.stderr)

    def ratio(q: str, a: str, b: str = "r13") -> float:
        return round(med[b][q] / med[a][q], 3)

    anchor_drift = {
        a: {n: ratio(n, a) for n in ANCHORS} for a in ("r10", "r11")
    }
    result = {
        "design": "paired same-boot A/B, alternating arm order per rep, "
        "1 warm-up pass per arm, clearCache before each measured rep",
        "arms": {
            "r10": f"{COMMIT_R10} (r10 HEAD, pre hot-cell split)",
            "r11": f"{COMMIT_R11} (r11 HEAD)",
            "r13": "r13 working HEAD",
        },
        "sf_dir": SF01,
        "repeats": REPEATS,
        "median_sec": med,
        "raw": meas,
        "targets": {
            "dedup_semantic_cells": {
                "ratio_r13_over_r10": ratio("dedup_semantic_cells", "r10"),
                "anchor_ratios_r13_over_r10": anchor_drift["r10"],
                "sf1_sec": {
                    k: [round(x, 3) for x in v] for k, v in sf1.items()
                },
                "sf1_ratio_r13_over_r10": (
                    round(
                        statistics.median(sf1["r13"])
                        / statistics.median(sf1["r10"]),
                        3,
                    )
                    if sf1["r10"]
                    else None
                ),
            },
            "knn_ivf_cells": {
                "ratio_r13_over_r11": ratio("knn_ivf_cells", "r11"),
                "anchor_ratios_r13_over_r11": anchor_drift["r11"],
            },
        },
        "triplicate_current_tree_sec": {
            n: meas["r13"][n] for n in TRIPLICATE
        },
    }
    out = os.path.join(REPO, "PERF_AB_R13.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result["targets"], indent=1))
    print(json.dumps(result["triplicate_current_tree_sec"]))


if __name__ == "__main__":
    main()
