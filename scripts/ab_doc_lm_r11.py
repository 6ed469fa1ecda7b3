"""Round-11 evidence for the doc_lm_perplexity sf10 superlinear flag.

BENCH_SCALING3 (r10) flagged doc_lm_perplexity at 10.64x on the
sf1->sf10 step, with same-boot variance evidence (51-114 s spread on
identical code) that was ruled insufficient: "a flag explained is not
a flag removed". Round 11 restructured the query (in-row zip_with
bigrams so token instances never shuffle; xxhash64 int64 bigram keys
so the LM join carries ~24-byte rows; hashed in-row-distinct vocab).

This script measures OLD (r10 code, inlined below byte-for-byte from
git history) vs NEW (the shipped registry builder) in ONE boot at sf1
and sf10, interleaved A/B with >=3 repeats per (impl, sf), and writes
DOC_LM_AB_R11.json with per-run times, medians, and the sf1->sf10
median ratio per implementation. Pass criterion: NEW's median decade
ratio <= 10 (linear-at-worst on 10x data).

Usage: python scripts/ab_doc_lm_r11.py [sf1_dir] [sf10_dir] [out]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from website_traffic_etl_gcp_spark import plans
from website_traffic_etl_gcp_spark.catalog import load_table
from website_traffic_etl_gcp_spark.functions.texthash import normalize_text
from website_traffic_etl_gcp_spark.plans.selection import _micro_nats
from website_traffic_etl_gcp_spark.session import get_spark

REPEATS = 3


def old_builder(spark, sf_dir):
    """The r10 plan, verbatim: window-lead bigrams over posexploded
    token instances, string (w1, w2) join keys, string vocab scan."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(normalize_text("text"), " ")).alias(
            "pos", "token"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    dbi = (
        tok.withColumn("w2", F.lead("token", 1).over(w))
        .filter(F.col("w2").isNotNull())
        .groupBy("doc_id", F.col("token").alias("w1"), "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bi = dbi.groupBy("w1", "w2").agg(F.sum("n").alias("c12"))
    uni = bi.groupBy("w1").agg(F.sum("c12").alias("c1"))
    voc = tok.agg(F.countDistinct("token").alias("v"))
    lp = (
        bi.join(uni, "w1")
        .crossJoin(F.broadcast(voc))
        .select(
            "w1",
            "w2",
            (
                _micro_nats(F.col("c12") + 1)
                - _micro_nats(F.col("c1") + F.col("v"))
            ).alias("lp_micro"),
        )
    )
    agg = (
        dbi.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("n") * F.col("lp_micro")).alias("s_micro"),
        )
    )
    ent = (-F.col("s_micro")).cast("double") / (
        F.col("n_bigrams") * F.lit(1000000)
    ).cast("double")
    return agg.select(
        "doc_id",
        "n_bigrams",
        ent.alias("cross_entropy_nats"),
        F.round(F.exp(ent), 6).alias("ppl"),
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        repo, ".bigdata", "sf1"
    )
    sf10 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, ".bigdata", "sf10"
    )
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        repo, "DOC_LM_AB_R11.json"
    )
    spark = get_spark()
    new_builder = plans.REGISTRY["doc_lm_perplexity"].builder
    impls = {"old_r10": old_builder, "new_r11": new_builder}

    def run(builder, sf_dir: str) -> float:
        t0 = time.perf_counter()
        builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return round(dt, 2)

    # warm everything once (file cache + codegen) before measuring
    for b in impls.values():
        for d in (sf1, sf10):
            run(b, d)

    times: dict[str, dict[str, list[float]]] = {
        k: {"sf1": [], "sf10": []} for k in impls
    }
    for _ in range(REPEATS):  # interleaved: ambient drift hits both
        for name, b in impls.items():
            times[name]["sf1"].append(run(b, sf1))
        for name, b in impls.items():
            times[name]["sf10"].append(run(b, sf10))

    report = {"repeats": REPEATS, "sf1_dir": sf1, "sf10_dir": sf10}
    for name in impls:
        m1 = statistics.median(times[name]["sf1"])
        m10 = statistics.median(times[name]["sf10"])
        report[name] = {
            "sf1_runs": times[name]["sf1"],
            "sf10_runs": times[name]["sf10"],
            "sf1_median": m1,
            "sf10_median": m10,
            "decade_ratio_median": round(m10 / m1, 2),
        }
    report["flag_cleared"] = report["new_r11"]["decade_ratio_median"] <= 10
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
