"""Round-14 second-wave A/B: kmeans assign kernel + Bloom packed
bitmap, paired same-boot against the committed round-14 HEAD
(3615bee) — the tree both changes branched from.

Targets:
- ``kmeans_embedding_clusters`` (+ the non-bench twin
  ``kmeans_quality_gate``): the literal-centroid ``transform`` +
  ``array_min`` assign evaluated k × dim interpreted HOF steps per
  row across five corpus passes; the r14b kernel runs the same
  arithmetic in Arrow batches (operators/clustering.py).
- ``bloom_prefiltered_revenue``: the sketch probe ran k=3 broadcast
  LEFT SEMI joins against a positions relation (3 broadcast
  exchanges + a distinct); the r14b form packs one 128-word bitmap
  row, broadcast once, tested in-row (operators/bloom.py).

Anchors on every arm: ``knn_bruteforce_cosine`` (embeddings family)
and ``q1_pricing_summary`` (global) — they separate a code effect
(target moves, anchors don't) from ambient drift (everything moves).

Usage: python scripts/ab_kmeans_bloom_r14.py   (writes AB_KMEANS_BLOOM_R14.json)
Assumes a worktree of 3615bee at /root/wt_head (creates if missing).
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
TREE_BASE = os.environ.get("AB_TREE_BASE", "/root/wt_head")
COMMIT_BASE = "3615bee"
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(REPO, ".bigdata/sf1"))
REPEATS = int(os.environ.get("AB_REPEATS", "4"))

ANCHORS = ["knn_bruteforce_cosine", "q1_pricing_summary"]
TARGETS = [
    "kmeans_embedding_clusters",
    "kmeans_quality_gate",
    "bloom_prefiltered_revenue",
]
SF1_TARGETS = ["kmeans_embedding_clusters", "bloom_prefiltered_revenue"]

PKG = "website_traffic_etl_gcp_spark"
QUERIES = TARGETS + ANCHORS


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
    trees = {TREE_BASE, REPO}
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
    _ensure_worktree(TREE_BASE, COMMIT_BASE)

    sys.path.insert(0, REPO)
    from website_traffic_etl_gcp_spark.session import get_spark

    spark = get_spark("ab-kmeans-bloom-r14")
    spark.sparkContext.setLogLevel("ERROR")
    arms = [("base", TREE_BASE), ("r14b", REPO)]

    meas = {label: {n: [] for n in QUERIES} for label, _ in arms}
    for label, tree in arms:  # warm-up: file cache + codegen
        reg = _load_registry(tree)
        for n in QUERIES:
            _run_one(reg, spark, n, SF01)
        print(f"warm-up {label} done", file=sys.stderr)

    for rep in range(REPEATS):
        order = arms if rep % 2 == 0 else list(reversed(arms))
        for label, tree in order:
            reg = _load_registry(tree)
            spark.catalog.clearCache()
            for n in QUERIES:
                meas[label][n].append(_run_one(reg, spark, n, SF01))
            print(f"rep {rep} {label} done", file=sys.stderr)

    med = {
        label: {n: round(statistics.median(v), 3) for n, v in qs.items()}
        for label, qs in meas.items()
    }

    # sf1 pass: the decade check that the win is not a fixed-overhead
    # artifact of the tiny bench SF
    sf1 = {label: {} for label, _ in arms}
    if os.path.isdir(SF1):
        for label, tree in arms:  # warm
            reg = _load_registry(tree)
            for n in SF1_TARGETS:
                _run_one(reg, spark, n, SF1)
        for rep in range(2):
            order = arms if rep % 2 == 0 else list(reversed(arms))
            for label, tree in order:
                reg = _load_registry(tree)
                spark.catalog.clearCache()
                for n in SF1_TARGETS:
                    sf1[label].setdefault(n, []).append(
                        _run_one(reg, spark, n, SF1)
                    )
                print(f"sf1 rep {rep} {label} done", file=sys.stderr)

    result = {
        "design": "paired same-boot A/B, alternating arm order per rep, "
        "1 warm-up pass per arm, clearCache before each measured rep",
        "arms": {
            "base": f"{COMMIT_BASE} (committed r14 HEAD: HOF kmeans "
            "assign, semi-join bloom)",
            "r14b": "r14 working tree (Arrow kmeans assign kernel, "
            "packed-bitmap bloom)",
        },
        "sf_dir": SF01,
        "repeats": REPEATS,
        "median_sec": med,
        "raw_sec": meas,
        "ratio_r14b_over_base": {
            n: round(med["r14b"][n] / med["base"][n], 3)
            for n in QUERIES
            if med["base"][n]
        },
        "sf1_sec": sf1,
        "sf1_ratio_r14b_over_base": {
            n: round(
                statistics.median(sf1["r14b"][n])
                / statistics.median(sf1["base"][n]),
                3,
            )
            for n in sf1.get("r14b", {})
            if sf1.get("base", {}).get(n)
        },
    }
    out = os.path.join(REPO, "AB_KMEANS_BLOOM_R14.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result["median_sec"]))
    print(json.dumps(result["ratio_r14b_over_base"]))


if __name__ == "__main__":
    main()
