"""Same-boot A/B of r9 HEAD vs r10 HEAD on the dedup headline tier.

The r10 verdict observed the dedup family reading ~1.2x over r9
uniformly and asked whether that band is ambient VM drift or a real
regression the drift-normalized detector missed. This script settles
it with a paired design inside ONE Spark boot: the two code trees
(git worktrees pinned at the round-9 and round-10 verdict commits)
alternate A/B/A/B, so ambient load hits both arms equally and the
per-query ratio isolates the code. A warm-up pass per arm absorbs
index builds and file-cache effects.

Usage: python scripts/ab_dedup_tier_r11.py  (writes DEDUP_AB_R11.json)
"""

from __future__ import annotations

import importlib
import json
import os
import statistics
import sys
import time

TREE_A = os.environ.get("AB_TREE_A", "/tmp/ab_r9")  # r9 HEAD
TREE_B = os.environ.get("AB_TREE_B", "/tmp/ab_r10")  # r10 HEAD
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("AB_REPEATS", "3"))

QUERIES = [
    "data_mix_sample",
    "dedup_jaccard_dfcap",
    "dedup_minhash_lsh",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_winnow_pairs",
    "dedup_containment_pairs",
    "dedup_incremental_minhash",
]

PKG = "website_traffic_etl_gcp_spark"


def _load_registry(tree: str):
    for mod in [m for m in sys.modules if m.startswith(PKG)]:
        del sys.modules[mod]
    sys.path = [p for p in sys.path if p not in (TREE_A, TREE_B, "/root/repo")]
    sys.path.insert(0, tree)
    plans = importlib.import_module(f"{PKG}.plans")
    return plans.REGISTRY


def _run(registry, spark, names) -> dict[str, float]:
    out = {}
    for n in names:
        t0 = time.perf_counter()
        registry[n].builder(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        out[n] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    # boot one session with the bench config (from the B tree — the
    # session confs are identical across the two commits)
    sys.path.insert(0, TREE_B)
    from website_traffic_etl_gcp_spark.session import get_spark

    spark = get_spark("ab-dedup-r11")
    times: dict[str, dict[str, list[float]]] = {
        "A_r9": {n: [] for n in QUERIES},
        "B_r10": {n: [] for n in QUERIES},
    }
    # warm-up: one full pass per arm (index builds, file cache, codegen)
    for label, tree in (("A_r9", TREE_A), ("B_r10", TREE_B)):
        _run(_load_registry(tree), spark, QUERIES)
    # measured: alternate arms so ambient drift cancels in the ratio
    for rep in range(REPEATS):
        order = (
            (("A_r9", TREE_A), ("B_r10", TREE_B))
            if rep % 2 == 0
            else (("B_r10", TREE_B), ("A_r9", TREE_A))
        )
        for label, tree in order:
            reg = _load_registry(tree)
            for n, t in _run(reg, spark, QUERIES).items():
                times[label][n].append(t)
            print(f"rep {rep} {label} done", file=sys.stderr)

    med = {
        label: {n: round(statistics.median(v), 3) for n, v in qs.items()}
        for label, qs in times.items()
    }
    ratios = {
        n: round(med["B_r10"][n] / med["A_r9"][n], 3) for n in QUERIES
    }
    agg_a = sum(med["A_r9"].values())
    agg_b = sum(med["B_r10"].values())
    result = {
        "sf_dir": SF_DIR,
        "repeats": REPEATS,
        "design": "paired same-boot A/B, alternating arm order per rep, "
        "1 warm-up pass per arm",
        "commit_a": "230a457 (r9 HEAD)",
        "commit_b": "5fca5a2 (r10 HEAD)",
        "median_sec": med,
        "ratio_b_over_a": ratios,
        "aggregate_a_sec": round(agg_a, 3),
        "aggregate_b_sec": round(agg_b, 3),
        "aggregate_ratio": round(agg_b / agg_a, 3),
        "raw": times,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "DEDUP_AB_R11.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps({"aggregate_ratio": result["aggregate_ratio"], "ratios": ratios}))


if __name__ == "__main__":
    main()
