"""Round-14 decision evidence for the kmeans assign kernel at sf10.

The sf0.1 paired A/B (AB_KMEANS_BLOOM_R14.json) read parity (0.96x)
and sf1 read 0.88x — the interpreted-HOF cost the kernel removes is
per-row, so the win should widen with corpus size. This script settles
the keep/revert call with the decade point: paired same-boot A/B of
``kmeans_embedding_clusters`` at sf10, base = committed r14 HEAD
(3615bee, HOF literal-centroid assign), r14b = working tree (Arrow
mapInPandas assign kernel). Anchor: knn_bruteforce_cosine.

Usage: python scripts/ab_kmeans_sf10_r14.py  (writes AB_KMEANS_SF10_R14.json)
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
SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", os.path.join(REPO, ".bigdata/sf10"))
REPEATS = int(os.environ.get("AB_REPEATS", "2"))

PKG = "website_traffic_etl_gcp_spark"
QUERIES = ["kmeans_embedding_clusters", "knn_bruteforce_cosine"]


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

    spark = get_spark("ab-kmeans-sf10-r14")
    spark.sparkContext.setLogLevel("ERROR")
    arms = [("base", TREE_BASE), ("r14b", REPO)]

    meas = {label: {n: [] for n in QUERIES} for label, _ in arms}
    for label, tree in arms:  # warm-up
        reg = _load_registry(tree)
        for n in QUERIES:
            _run_one(reg, spark, n, SF10)
        print(f"warm-up {label} done", file=sys.stderr)

    for rep in range(REPEATS):
        order = arms if rep % 2 == 0 else list(reversed(arms))
        for label, tree in order:
            reg = _load_registry(tree)
            spark.catalog.clearCache()
            for n in QUERIES:
                meas[label][n].append(_run_one(reg, spark, n, SF10))
            print(f"rep {rep} {label} done", file=sys.stderr)

    med = {
        label: {n: round(statistics.median(v), 3) for n, v in qs.items()}
        for label, qs in meas.items()
    }
    result = {
        "design": "paired same-boot A/B at sf10, alternating arm order, "
        "1 warm-up pass per arm, clearCache before each measured rep",
        "arms": {
            "base": f"{COMMIT_BASE} (HOF literal-centroid assign)",
            "r14b": "working tree (Arrow mapInPandas assign kernel)",
        },
        "sf_dir": SF10,
        "repeats": REPEATS,
        "median_sec": med,
        "raw_sec": meas,
        "ratio_r14b_over_base": {
            n: round(med["r14b"][n] / med["base"][n], 3)
            for n in QUERIES
            if med["base"][n]
        },
    }
    out = os.path.join(REPO, "AB_KMEANS_SF10_R14.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result["median_sec"]))
    print(json.dumps(result["ratio_r14b_over_base"]))


if __name__ == "__main__":
    main()
