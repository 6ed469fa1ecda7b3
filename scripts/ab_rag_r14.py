"""Round-14 perf adjudication (VERDICT r13 items 1 and 4).

Two questions, one same-boot paired design:

1. ``rag_chunk_ann_pipeline`` read 9.49 s / 7.68 s in the judge's two
   same-boot r13 subsets vs its 4.14 s driver-fresh best (anchors at
   only 1.07-1.54x) and had NO adjudication ledger entry — the
   suite's biggest query needs a triplicate-derived ceiling or a
   found-and-cut cost. This script runs the triplicate on BOTH the
   r13 tree and the r14 working HEAD, recording the warm-up (cold,
   first-touch) pass separately from the measured reps so a
   first-touch cost the driver's boot amortized shows up explicitly.
2. The r14 ``lsh_topk`` mask-before-dot rewrite (candidates pruned
   BEFORE the dot loop — at multiprobe density ~29% the old order
   spent ~3x the needed pair flops) claims a win that must be shown
   same-boot at sf10 on the lsh callers, per the verdict's "Done"
   criterion.

Design: one Spark boot; arms alternate order per rep so ambient load
cancels; 1 warm-up pass per (arm, sf); clearCache before each
measured rep; anchors (q1_pricing_summary global,
knn_bruteforce_cosine embeddings-family) measured on every arm to
separate code movement from drift.

Usage: python scripts/ab_rag_r14.py   (writes PERF_AB_R14.json)
Assumes/creates a git worktree at /tmp/ab14_r13 pinned to the r13
final commit. sf10 section runs only if <repo>/.bigdata/sf10 exists.
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
TREE_R13 = os.environ.get("AB_TREE_R13", "/tmp/ab14_r13")
COMMIT_R13 = "7b80fa2"
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF10 = os.environ.get(
    "SPARK_GRAFT_SF10_DIR", os.path.join(REPO, ".bigdata/sf10")
)
REPEATS = int(os.environ.get("AB_REPEATS", "3"))

PKG = "website_traffic_etl_gcp_spark"
ANCHORS = ["q1_pricing_summary", "knn_bruteforce_cosine"]
TARGETS = ["rag_chunk_ann_pipeline", "knn_lsh_bucketed", "knn_recall_eval"]
SF10_QUERIES = ["rag_chunk_ann_pipeline", "knn_lsh_bucketed"]


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
    sys.path = [p for p in sys.path if p not in {TREE_R13, REPO}]
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
    _ensure_worktree(TREE_R13, COMMIT_R13)

    sys.path.insert(0, REPO)
    from website_traffic_etl_gcp_spark.session import get_spark

    spark = get_spark("ab-rag-r14")
    spark.sparkContext.setLogLevel("ERROR")

    arms = [("r13", TREE_R13), ("r14", REPO)]
    qs = TARGETS + ANCHORS
    cold: dict[str, dict[str, float]] = {}
    meas: dict[str, dict[str, list[float]]] = {
        label: {n: [] for n in qs} for label, _ in arms
    }

    # warm-up pass per arm — RECORDED: the first-touch delta vs the
    # steady-state reps is the "warm scratch/chunk state" hypothesis
    for label, tree in arms:
        reg = _load_registry(tree)
        cold[label] = {n: _run_one(reg, spark, n, SF01) for n in qs}
        print(f"warm-up {label}: {cold[label]}", file=sys.stderr)

    for rep in range(REPEATS):
        order = arms if rep % 2 == 0 else list(reversed(arms))
        for label, tree in order:
            reg = _load_registry(tree)
            spark.catalog.clearCache()
            for n in qs:
                meas[label][n].append(_run_one(reg, spark, n, SF01))
            print(f"rep {rep} {label} done", file=sys.stderr)

    med = {
        label: {n: round(statistics.median(v), 3) for n, v in d.items()}
        for label, d in meas.items()
    }

    # ---- sf10 A/B for the lsh_topk rewrite (verdict item 4) ----
    sf10 = {label: {n: [] for n in SF10_QUERIES} for label, _ in arms}
    if os.path.isdir(SF10):
        for label, tree in arms:  # warm
            reg = _load_registry(tree)
            for n in SF10_QUERIES:
                _run_one(reg, spark, n, SF10)
            print(f"sf10 warm-up {label} done", file=sys.stderr)
        for rep in range(2):
            order = arms if rep % 2 == 0 else list(reversed(arms))
            for label, tree in order:
                reg = _load_registry(tree)
                spark.catalog.clearCache()
                for n in SF10_QUERIES:
                    sf10[label][n].append(_run_one(reg, spark, n, SF10))
                print(f"sf10 rep {rep} {label} done", file=sys.stderr)

    def med_of(d, label, n):
        return statistics.median(d[label][n]) if d[label][n] else None

    result = {
        "design": "paired same-boot A/B, alternating arm order per rep, "
        "recorded warm-up (cold) pass per arm, clearCache before each "
        "measured rep",
        "arms": {
            "r13": f"{COMMIT_R13} (r13 final HEAD, compute-then-mask "
            "lsh_topk)",
            "r14": "r14 working HEAD (mask-before-dot lsh_topk)",
        },
        "sf_dir": SF01,
        "repeats": REPEATS,
        "cold_first_touch_sec": cold,
        "median_sec": med,
        "raw": meas,
        "rag_triplicate": {
            "r14_runs_sec": meas["r14"]["rag_chunk_ann_pipeline"],
            "r13_runs_sec": meas["r13"]["rag_chunk_ann_pipeline"],
            "cold_minus_steady_r14": round(
                cold["r14"]["rag_chunk_ann_pipeline"]
                - med["r14"]["rag_chunk_ann_pipeline"],
                3,
            ),
            "anchor_ratios_r14_over_r13": {
                a: round(med["r14"][a] / med["r13"][a], 3) for a in ANCHORS
            },
        },
        "lsh_rewrite_sf01_ratio_r14_over_r13": {
            n: round(med["r14"][n] / med["r13"][n], 3) for n in TARGETS
        },
        "sf10": {
            "dir": SF10 if os.path.isdir(SF10) else None,
            "sec": sf10,
            "ratio_r14_over_r13": {
                n: (
                    round(med_of(sf10, "r14", n) / med_of(sf10, "r13", n), 3)
                    if med_of(sf10, "r13", n)
                    else None
                )
                for n in SF10_QUERIES
            },
        },
    }
    out = os.path.join(REPO, "PERF_AB_R14.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result["lsh_rewrite_sf01_ratio_r14_over_r13"]))
    print(json.dumps(result["rag_triplicate"]))


if __name__ == "__main__":
    main()
