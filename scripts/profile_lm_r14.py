"""Round-14 wave-7 profile: the LM-perplexity pair and the winnow
family — the two "profile first" items on the r14 not-yet-optimized
list.

Hypothesis (the r13 interpreted-HOF finding): doc_lm_perplexity builds
bigrams with zip_with(xxhash64-lambda) and doc_lm_perplexity_tri with
transform(sequence, element_at-lambda) — per-token interpreted
expression walks. The winnow family is whole-stage codegen but
shuffles O(shingles) for its doc_id windows.

This decomposes each query's wall inside one boot (best-of-2 after a
warm-up, noop sink): tokenize-only, n-gram-stage-only, voc-only, full
query. Kernel criterion (VERDICT r13 item 6): interpreted stages
>30% of the query.

Usage: python scripts/profile_lm_r14.py  (writes LM_PROFILE_R14.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from website_traffic_etl_gcp_spark import plans  # noqa: E402
from website_traffic_etl_gcp_spark.functions.texthash import (  # noqa: E402
    word_tokens,
)
from website_traffic_etl_gcp_spark.operators import fingerprint as fpr  # noqa: E402
from website_traffic_etl_gcp_spark.plans.selection import _docs  # noqa: E402
from website_traffic_etl_gcp_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(REPO, ".bigdata/sf1"))
REPEATS = 2


def timed(fn) -> float:
    best = None
    for _ in range(REPEATS + 1):  # first run is the warm-up
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def stages_for(spark, sf_dir):
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", word_tokens("text").alias("t"))

    # --- bigram query internals (mirrors plans/selection.py) ---
    big = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
                lambda a, b: F.struct(
                    F.xxhash64(a).alias("w1id"),
                    F.xxhash64(a, b).alias("bid"),
                ),
            )
        ).alias("bg"),
    )
    dbi = big.groupBy(
        "doc_id",
        F.col("bg.w1id").alias("w1id"),
        F.col("bg.bid").alias("bid"),
    ).agg(F.count(F.lit(1)).alias("n"))
    voc = toks.select(
        F.explode(
            F.array_distinct(F.transform("t", lambda x: F.xxhash64(x)))
        ).alias("tid")
    ).agg(F.countDistinct("tid").alias("v"))

    # --- trigram in-row stage ---
    tri_in = toks.filter(F.size("t") >= 3).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 2),
                lambda i: F.struct(
                    F.xxhash64(
                        F.element_at(F.col("t"), i),
                        F.element_at(F.col("t"), i + 1),
                    ).alias("cid"),
                    F.xxhash64(
                        F.element_at(F.col("t"), i),
                        F.element_at(F.col("t"), i + 1),
                        F.element_at(F.col("t"), i + 2),
                    ).alias("tid"),
                ),
            )
        ).alias("tg"),
    )
    dtr = tri_in.groupBy(
        "doc_id",
        F.col("tg.cid").alias("cid"),
        F.col("tg.tid").alias("tid"),
    ).agg(F.count(F.lit(1)).alias("n"))

    reg = plans.REGISTRY
    return {
        "tokenize_only": lambda: noop(toks),
        "bigram_dbi_stage": lambda: noop(dbi),
        "voc_stage": lambda: noop(voc),
        "full_doc_lm_perplexity": lambda: noop(
            reg["doc_lm_perplexity"].builder(spark, sf_dir)
        ),
        "trigram_dtr_stage": lambda: noop(dtr),
        "full_doc_lm_perplexity_tri": lambda: noop(
            reg["doc_lm_perplexity_tri"].builder(spark, sf_dir)
        ),
        "winnow_shingles_md5": lambda: noop(
            fpr.positional_shingles(_docs(spark, sf_dir))
        ),
        "winnow_fingerprints": lambda: noop(
            reg["doc_winnow_fingerprints"].builder(spark, sf_dir)
        ),
        "full_dedup_winnow_pairs": lambda: noop(
            reg["dedup_winnow_pairs"].builder(spark, sf_dir)
        ),
    }


def main() -> None:
    spark = get_spark("profile-lm-r14")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"sf_dirs": {}}
    for label, sf in [("sf0.1", SF_DIR), ("sf1", SF1)]:
        if not os.path.isdir(sf) and not os.path.exists(sf):
            continue
        spark.catalog.clearCache()
        res = {}
        for name, fn in stages_for(spark, sf).items():
            spark.sparkContext.setJobDescription(f"profile {name} {label}")
            res[name] = timed(fn)
            print(label, name, res[name], file=sys.stderr, flush=True)
        out["sf_dirs"][label] = res

    for label, res in out["sf_dirs"].items():
        full = res["full_doc_lm_perplexity"]
        res["bigram_stage_share"] = round(
            (res["bigram_dbi_stage"] - res["tokenize_only"]) / full, 3
        )
        res["tri_stage_share"] = round(
            (res["trigram_dtr_stage"] - res["tokenize_only"])
            / res["full_doc_lm_perplexity_tri"],
            3,
        )
        res["winnow_window_share"] = round(
            (res["winnow_fingerprints"] - res["winnow_shingles_md5"])
            / res["full_dedup_winnow_pairs"],
            3,
        )

    with open(os.path.join(REPO, "LM_PROFILE_R14.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
