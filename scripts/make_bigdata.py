"""Deterministic 10x scale-up of the driver's sf0.1 testdata → sf1.

The benchmark's scaling evidence needs a point where per-query times
are multi-second, not startup-dominated; the driver only ships up to
sf0.1 and /root/testdata is read-only, so sf1 is derived locally
(default output: <repo>/.bigdata/sf1, gitignored).

Construction: REPLICATE×10 with disjoint key spaces — replica k adds
k·10^7 to every key column (order/cust/part/supp/event/user/doc/vec),
preserving every join relationship and per-key distribution exactly,
so each replica is an isomorphic, disjoint sub-corpus and the ideal
scaling of every workload is exactly linear. Text columns get a
per-replica token prefix (replicas must NOT be exact/near duplicates
of each other — that would quadratically inflate dedup pair counts
and measure a different workload); n_chars is recomputed. Embedding
replicas perturb one component so ANN neighbors stay within-replica.
Timestamps are kept verbatim: time-window row counts scale 10x while
the window count stays fixed, like a 10x-traffic day.

Usage: python scripts/make_bigdata.py [src_dir] [out_dir] [key_offset]

Second decade (sf1 → sf10): pass key_offset=10**9 — sf1 keys occupy
bands [k·10^7, k·10^7 + 6·10^5], so the default offset would COLLIDE
band k+j with an existing band; 10^9 keeps every replica's key space
disjoint again. Optional env:
  SPARK_GRAFT_BIGDATA_TABLES  comma list — scale only these tables
  SPARK_GRAFT_BIGDATA_OUTMULT multiply per-table output file counts
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from website_traffic_etl_gcp_spark.session import get_spark

REPLICAS = 10
KEY_OFFSET = 10**7  # > every key value at sf0.1 (max ~6·10^5)
if len(sys.argv) > 3:
    KEY_OFFSET = int(sys.argv[3])

KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_TABLES = ("region", "nation")  # shared dims stay as-is
# enough files that a default-config scan (128 MB splits) arrives
# with real parallelism: the 2-file documents layout previously
# serialized CPU-heavy per-doc text queries onto 2 cores at sf1
# (dup_ngram_fraction measured 112 s on 2 partitions vs ~8 s wide)
OUT_FILES = {
    "lineitem": 16,
    "orders": 8,
    "events": 8,
    "documents": 16,
    "embeddings": 8,
}


def _replica(df: DataFrame, table: str, k: int) -> DataFrame:
    out = df
    for col in KEY_COLS[table]:
        out = out.withColumn(col, F.col(col) + F.lit(k * KEY_OFFSET))
    # replica-distinct text/embeddings: at decade 2 the source rows
    # already carry an r{j} prefix, so the second prefix composes to
    # r{k}r{j} — still globally distinct, never an exact duplicate
    if table == "documents" and k > 0:
        out = out.withColumn(
            "text",
            F.expr(
                f"array_join(transform(split(text, ' '), "
                f"x -> 'r{k}' || x), ' ')"
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings" and k > 0:
        out = out.withColumn(
            "embedding",
            F.expr(
                f"transform(embedding, (x, i) -> CASE WHEN i = 0 "
                f"THEN CAST(x + {k} * 0.0001 AS FLOAT) ELSE x END)"
            ),
        )
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".bigdata",
            "sf1",
        )
    )
    os.makedirs(out, exist_ok=True)
    spark = get_spark("make-bigdata")
    spark.sparkContext.setLogLevel("ERROR")

    only = os.environ.get("SPARK_GRAFT_BIGDATA_TABLES")
    wanted = set(only.split(",")) if only else None
    outmult = int(os.environ.get("SPARK_GRAFT_BIGDATA_OUTMULT", "1"))

    for t in COPY_TABLES:
        if wanted is not None and t not in wanted:
            continue
        shutil.copyfile(
            os.path.join(src, f"{t}.parquet"),
            os.path.join(out, f"{t}.parquet"),
        )
        print(f"{t}: copied")

    for t, _ in KEY_COLS.items():
        if wanted is not None and t not in wanted:
            continue
        base = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        scaled = None
        for k in range(REPLICAS):
            rep = _replica(base, t, k)
            scaled = rep if scaled is None else scaled.unionByName(rep)
        dest = os.path.join(out, f"{t}.parquet")
        scaled.repartition(OUT_FILES.get(t, 2) * outmult).write.mode(
            "overwrite"
        ).parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{t}: {n} rows -> {dest}")


if __name__ == "__main__":
    main()
