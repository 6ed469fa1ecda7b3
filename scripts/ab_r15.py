"""Round-15 reusable paired same-boot A/B harness.

Compares the working tree against the committed round-14 ship
(94e27c8) on a named query set, alternating arm order per rep with a
warm-up pass per arm, timing through the noop sink. Ambient drift
hits both arms identically inside one boot, so the per-query ratio
isolates the code effect (the protocol every r11-r14 A/B used).

Usage:
  AB_TARGETS=q1,q2 AB_ANCHORS=a1 AB_OUT=AB_FOO_R15.json \
      python scripts/ab_r15.py [--sf1] [--sf10]

Env:
  AB_TARGETS  comma list of changed queries (required)
  AB_ANCHORS  comma list of untouched same-family anchors
  AB_OUT      output JSON path (default AB_R15.json in repo root)
  AB_REPEATS  measured reps at sf0.1 (default 4; big SFs use 2)
  AB_BASE     base commit (default 94e27c8, the r14 ship)
  AB_NOTE     free-text description folded into the artifact
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
COMMIT_BASE = os.environ.get("AB_BASE", "94e27c8")
TREE_BASE = os.environ.get("AB_TREE_BASE", f"/root/wt_{COMMIT_BASE}")
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(REPO, ".bigdata/sf1"))
SF10 = os.environ.get(
    "SPARK_GRAFT_SF10_DIR", os.path.join(REPO, ".bigdata/sf10")
)
REPEATS = int(os.environ.get("AB_REPEATS", "4"))

PKG = "website_traffic_etl_gcp_spark"


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


def _paired(spark, arms, queries, sf_dir, repeats):
    meas = {label: {n: [] for n in queries} for label, _ in arms}
    for label, tree in arms:  # warm-up: file cache + codegen
        reg = _load_registry(tree)
        for n in queries:
            _run_one(reg, spark, n, sf_dir)
        print(f"warm-up {label} {sf_dir} done", file=sys.stderr)
    for rep in range(repeats):
        order = arms if rep % 2 == 0 else list(reversed(arms))
        for label, tree in order:
            reg = _load_registry(tree)
            spark.catalog.clearCache()
            for n in queries:
                meas[label][n].append(_run_one(reg, spark, n, sf_dir))
            print(f"rep {rep} {label} {sf_dir} done", file=sys.stderr)
    return meas


def main() -> None:
    targets = [
        n.strip()
        for n in os.environ.get("AB_TARGETS", "").split(",")
        if n.strip()
    ]
    anchors = [
        n.strip()
        for n in os.environ.get("AB_ANCHORS", "").split(",")
        if n.strip()
    ]
    if not targets:
        raise SystemExit("AB_TARGETS required")
    out_path = os.path.join(
        REPO, os.environ.get("AB_OUT", "AB_R15.json")
    )
    queries = targets + anchors

    _ensure_worktree(TREE_BASE, COMMIT_BASE)
    sys.path.insert(0, REPO)
    from website_traffic_etl_gcp_spark.session import get_spark

    spark = get_spark("ab-r15")
    spark.sparkContext.setLogLevel("ERROR")
    arms = [("base", TREE_BASE), ("r15", REPO)]

    blocks = {"sf0.1": _paired(spark, arms, queries, SF01, REPEATS)}
    if "--sf1" in sys.argv and os.path.isdir(SF1):
        blocks["sf1"] = _paired(spark, arms, targets, SF1, 2)
    if "--sf10" in sys.argv and os.path.isdir(SF10):
        blocks["sf10"] = _paired(spark, arms, targets, SF10, 2)

    def _med(block):
        return {
            label: {
                n: round(statistics.median(v), 3) for n, v in qs.items()
            }
            for label, qs in block.items()
        }

    def _ratio(block):
        med = _med(block)
        return {
            n: round(med["r15"][n] / med["base"][n], 3)
            for n in med.get("r15", {})
            if med.get("base", {}).get(n)
        }

    result = {
        "design": "paired same-boot A/B, alternating arm order per rep, "
        "1 warm-up pass per arm, clearCache before each measured rep, "
        "noop sink",
        "note": os.environ.get("AB_NOTE", ""),
        "base_commit": COMMIT_BASE,
        "targets": targets,
        "anchors": anchors,
        "repeats": REPEATS,
        "median_sec": {k: _med(v) for k, v in blocks.items()},
        "ratio_r15_over_base": {k: _ratio(v) for k, v in blocks.items()},
        "raw_sec": blocks,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result["ratio_r15_over_base"]))


if __name__ == "__main__":
    main()
