"""Round-14 wave-11 A/B: Bloom xxhash64 bit-slice positions + BPE
checkpoint cadence, paired same-boot against the committed round-14
HEAD (c4ca5d8) — the tree both changes branched from.

Targets:
- ``bloom_prefiltered_revenue``: the sketch derived k=3 positions per
  key as ``md5(cast(key as string) || '#i') % m`` — string concat +
  md5 + hex-parse, THREE times per probe row on the BIG side, before
  the shuffle. The r14c form takes 3 disjoint 13-bit slices of ONE
  ``xxhash64(key)`` (codegen, raw key bytes). The filter is invisible
  to the result (no false negatives either way; the exact join removes
  false positives), so the oracle is untouched by construction.
- ``bpe_train_merges`` (+ ``bpe_fertility_by_lang``, same operator):
  the merge loop localCheckpoint-ed the word table EVERY round — an
  extra materialization job per round in a loop whose wall is fixed
  job overhead (the table is vocabulary-bounded). r14c checkpoints
  every 4 rounds; round arithmetic is unchanged (stacked replace
  chains re-evaluate the same values).

Anchors on every arm: ``q1_pricing_summary`` (global) and
``dedup_exact`` (documents family) — they separate a code effect
(target moves, anchors don't) from ambient drift (everything moves).

Usage: python scripts/ab_bloom_bpe_r14.py   (writes AB_BLOOM_BPE_R14.json)
Assumes a worktree of c4ca5d8 at /root/wt_head14 (creates if missing).
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
TREE_BASE = os.environ.get("AB_TREE_BASE", "/root/wt_head14")
COMMIT_BASE = "c4ca5d8"
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(REPO, ".bigdata/sf1"))
SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", os.path.join(REPO, ".bigdata/sf10"))
REPEATS = int(os.environ.get("AB_REPEATS", "4"))

ANCHORS = ["q1_pricing_summary", "dedup_exact"]
TARGETS = [
    "bloom_prefiltered_revenue",
    "bpe_train_merges",
    "bpe_fertility_by_lang",
]
BIG_TARGETS = ["bloom_prefiltered_revenue", "bpe_train_merges"]

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

    spark = get_spark("ab-bloom-bpe-r14")
    spark.sparkContext.setLogLevel("ERROR")
    arms = [("base", TREE_BASE), ("r14c", REPO)]

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

    # scale passes: the decade check that the win is not a
    # fixed-overhead artifact of the tiny bench SF
    big = {}
    for sf_label, sf_dir, reps in (("sf1", SF1, 2), ("sf10", SF10, 2)):
        if not os.path.isdir(sf_dir):
            continue
        res = {label: {} for label, _ in arms}
        for label, tree in arms:  # warm
            reg = _load_registry(tree)
            for n in BIG_TARGETS + ["q1_pricing_summary"]:
                _run_one(reg, spark, n, sf_dir)
        for rep in range(reps):
            order = arms if rep % 2 == 0 else list(reversed(arms))
            for label, tree in order:
                reg = _load_registry(tree)
                spark.catalog.clearCache()
                for n in BIG_TARGETS + ["q1_pricing_summary"]:
                    res[label].setdefault(n, []).append(
                        _run_one(reg, spark, n, sf_dir)
                    )
                print(f"{sf_label} rep {rep} {label} done", file=sys.stderr)
        big[sf_label] = {
            "sec": res,
            "ratio_r14c_over_base": {
                n: round(
                    statistics.median(res["r14c"][n])
                    / statistics.median(res["base"][n]),
                    3,
                )
                for n in res.get("r14c", {})
                if res.get("base", {}).get(n)
            },
        }

    result = {
        "design": "paired same-boot A/B, alternating arm order per rep, "
        "1 warm-up pass per arm, clearCache before each measured rep",
        "arms": {
            "base": f"{COMMIT_BASE} (committed r14 HEAD: md5-position "
            "bloom, per-round BPE checkpoint)",
            "r14c": "r14 working tree (xxhash64 bit-slice bloom, "
            "BPE checkpoint every 4 rounds)",
        },
        "sf_dir": SF01,
        "repeats": REPEATS,
        "median_sec": med,
        "raw_sec": meas,
        "ratio_r14c_over_base": {
            n: round(med["r14c"][n] / med["base"][n], 3)
            for n in QUERIES
            if med["base"][n]
        },
        "scale": big,
    }
    out = os.path.join(REPO, "AB_BLOOM_BPE_R14.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result["median_sec"]))
    print(json.dumps(result["ratio_r14c_over_base"]))


if __name__ == "__main__":
    main()
