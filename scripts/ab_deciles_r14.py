"""Round-14 wave-13 A/B: customer_balance_deciles histogram rewrite,
paired same-boot against the committed tree it branched from
(635de53, global-NTILE form).

The old form sorts EVERY customer row in one task (global NTILE —
guide §2.5's unsplittable key); the new form aggregates to the
bounded (c_acctbal, cnt) histogram in parallel and computes NTILE's
closed-form bucket boundaries as clamped interval overlaps. Results
bit-identical (ties share a balance, so per-decile aggregates are
invariant to tie placement); oracle unchanged.

Anchors: q1_pricing_summary (global), value_percentiles_approx
(advanced/window family).

Usage: python scripts/ab_deciles_r14.py   (writes AB_DECILES_R14.json)
Assumes a worktree of 635de53 at /root/wt_deciles (creates if missing).
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
TREE_BASE = os.environ.get("AB_TREE_BASE", "/root/wt_deciles")
COMMIT_BASE = "635de53"
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.path.join(REPO, ".bigdata/sf1")
SF10 = os.path.join(REPO, ".bigdata/sf10")
REPEATS = int(os.environ.get("AB_REPEATS", "4"))

ANCHORS = ["q1_pricing_summary", "value_percentiles_approx"]
TARGETS = ["customer_balance_deciles"]
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

    spark = get_spark("ab-deciles-r14")
    spark.sparkContext.setLogLevel("ERROR")
    arms = [("base", TREE_BASE), ("r14d", REPO)]

    out = {}
    for sf_label, sf_dir, reps in (
        ("sf0.1", SF01, REPEATS),
        ("sf1", SF1, 2),
        ("sf10", SF10, 2),
    ):
        if not os.path.isdir(sf_dir):
            continue
        res = {label: {} for label, _ in arms}
        for label, tree in arms:  # warm
            reg = _load_registry(tree)
            for n in QUERIES:
                _run_one(reg, spark, n, sf_dir)
        for rep in range(reps):
            order = arms if rep % 2 == 0 else list(reversed(arms))
            for label, tree in order:
                reg = _load_registry(tree)
                spark.catalog.clearCache()
                for n in QUERIES:
                    res[label].setdefault(n, []).append(
                        _run_one(reg, spark, n, sf_dir)
                    )
                print(f"{sf_label} rep {rep} {label} done", file=sys.stderr)
        out[sf_label] = {
            "sec": res,
            "ratio_r14d_over_base": {
                n: round(
                    statistics.median(res["r14d"][n])
                    / statistics.median(res["base"][n]),
                    3,
                )
                for n in res["r14d"]
                if res["base"].get(n)
            },
        }

    result = {
        "design": "paired same-boot A/B, alternating arm order per rep, "
        "1 warm-up pass per arm, clearCache before each measured rep",
        "arms": {
            "base": f"{COMMIT_BASE} (global-NTILE customer_balance_deciles)",
            "r14d": "r14 working tree (balance-histogram closed-form)",
        },
        "scale": out,
    }
    with open(os.path.join(REPO, "AB_DECILES_R14.json"), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps({k: v["ratio_r14d_over_base"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
