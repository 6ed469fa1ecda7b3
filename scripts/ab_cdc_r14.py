"""Round-14 wave-9 A/B: the CDC chunk kernel, paired same-boot
against the committed tree.

Before: posexplode + lag-window cut detection + a collect_list chunk
rebuild — every token STRING crossed the doc_id window exchange and
chunk text was re-assembled via a second O(tokens) aggregate. After:
one mapInArrow pass (operators/fingerprint.py cdc_chunks) — the
K-gram cut hash and the chunk hash are md5 over byte slices of the
normalized doc, running cut-count and chunk grouping vectorized
numpy; ZERO shuffle. Bit-exact (md5-based hashes unchanged);
verified vs the unchanged DuckDB oracles at sf0.001/sf0.01 (+ sf1
before commit).

Anchors: `q1_pricing_summary` (global) and `dedup_exact` (documents
scan family) separate a code effect from ambient drift.

Usage: python scripts/ab_cdc_r14.py  (writes AB_CDC_R14.json)
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
SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", os.path.join(REPO, ".bigdata/sf10"))
REPEATS = int(os.environ.get("AB_REPEATS", "4"))

ANCHORS = ["q1_pricing_summary", "dedup_exact"]
TARGETS = ["doc_cdc_chunks", "dedup_cdc_span_manifest"]
BIG_TARGETS = ["doc_cdc_chunks", "dedup_cdc_span_manifest", "q1_pricing_summary"]

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
    _ensure_worktree(TREE_BASE, COMMIT_BASE)

    sys.path.insert(0, REPO)
    from website_traffic_etl_gcp_spark.session import get_spark

    spark = get_spark("ab-cdc-r14")
    spark.sparkContext.setLogLevel("ERROR")
    arms = [("base", TREE_BASE), ("r14f", REPO)]

    meas = _paired(spark, arms, QUERIES, SF01, REPEATS)
    med = {
        label: {n: round(statistics.median(v), 3) for n, v in qs.items()}
        for label, qs in meas.items()
    }

    sf1 = sf10 = {}
    if os.path.isdir(SF1):
        sf1 = _paired(spark, arms, BIG_TARGETS, SF1, 2)
    if os.path.isdir(SF10):
        sf10 = _paired(spark, arms, BIG_TARGETS, SF10, 2)

    def _ratio(block):
        return {
            n: round(
                statistics.median(block["r14f"][n])
                / statistics.median(block["base"][n]),
                3,
            )
            for n in block.get("r14f", {})
            if block.get("base", {}).get(n)
        }

    result = {
        "design": "paired same-boot A/B, alternating arm order per rep, "
        "1 warm-up pass per arm, clearCache before each measured rep, "
        "noop sink",
        "arms": {
            "base": f"{COMMIT_BASE} (explode + lag-window CDC chunking)",
            "r14f": "r14 working tree (zero-shuffle CDC chunk kernel)",
        },
        "sf_dir": SF01,
        "repeats": REPEATS,
        "median_sec": med,
        "raw_sec": meas,
        "ratio_r14f_over_base": {
            n: round(med["r14f"][n] / med["base"][n], 3)
            for n in QUERIES
            if med["base"][n]
        },
        "sf1_sec": sf1,
        "sf1_ratio_r14f_over_base": _ratio(sf1) if sf1 else {},
        "sf10_sec": sf10,
        "sf10_ratio_r14f_over_base": _ratio(sf10) if sf10 else {},
    }
    out = os.path.join(REPO, "AB_CDC_R14.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result["median_sec"]))
    print(json.dumps(result["ratio_r14f_over_base"]))
    print(json.dumps({"sf1": result["sf1_ratio_r14f_over_base"],
                      "sf10": result["sf10_ratio_r14f_over_base"]}))


if __name__ == "__main__":
    main()
