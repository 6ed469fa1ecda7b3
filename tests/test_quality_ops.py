"""Semantic invariants for the decontamination / repetition quality
signals, plus an equivalence proof that q21's aggregate rewrite matches
the literal EXISTS / NOT EXISTS formulation."""

from __future__ import annotations

from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.catalog import load_table
from website_traffic_etl_gcp_spark.plans.registry import REGISTRY

from .conftest import SF_DIR


def test_decontamination_invariants(spark):
    rows = REGISTRY["decontaminate_eval_overlap"].builder(spark, SF_DIR).collect()
    assert rows, "eval overlap should flag at least one doc at sf0.001"
    for r in rows:
        assert 1 <= r["n_overlap"] <= r["n_shingles"]
        assert 0.0 < r["overlap_ratio"] <= 1.0


def test_decontamination_excludes_eval_docs(spark):
    flagged = {
        r["doc_id"]
        for r in REGISTRY["decontaminate_eval_overlap"]
        .builder(spark, SF_DIR)
        .collect()
    }
    eval_ids = {
        r["doc_id"]
        for r in load_table(spark, SF_DIR, "documents")
        .filter(F.col("source") == "src0")
        .collect()
    }
    assert not flagged & eval_ids


def test_repetition_score_bounds(spark):
    rows = REGISTRY["doc_repetition_score"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["top_bigram_count"] <= r["n_bigrams"]
        assert 0.0 < r["top_share"] <= 1.0


def test_repetition_score_flags_pure_repeat(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam"), (2, "a b c d e f g")],
        "doc_id long, text string",
    )
    import website_traffic_etl_gcp_spark.plans.documents as docs_mod

    # same logic as the registry query, applied to a local frame
    from website_traffic_etl_gcp_spark.functions.texthash import normalize_text
    from pyspark.sql import Window

    tok = df.select(
        "doc_id",
        F.posexplode(F.split(normalize_text("text"), " ")).alias("pos", "token"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    cnt = (
        tok.withColumn("nxt", F.lead("token", 1).over(w))
        .filter(F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws(" ", "token", "nxt").alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    out = {
        r["doc_id"]: r
        for r in cnt.groupBy("doc_id")
        .agg(
            F.max("c").alias("top"),
            F.sum("c").alias("n"),
            (F.max("c").cast("double") / F.sum("c").cast("double")).alias("share"),
        )
        .collect()
    }
    assert out[1]["share"] == 1.0  # all bigrams identical
    assert out[2]["share"] == 1.0 / 6.0  # all bigrams distinct


def test_q21_matches_exists_formulation(spark):
    """The two-aggregate rewrite must equal the literal correlated
    formulation: late line l of supplier s on a finished order o, where
    EXISTS another supplier's line in o and NOT EXISTS another
    supplier's LATE line in o."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lo = li.join(o, li.l_orderkey == o.o_orderkey)
    late = lo.filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).select("l_orderkey", "l_suppkey").distinct()

    base = late.alias("x")
    other_any = lo.select("l_orderkey", "l_suppkey").distinct().alias("y")
    other_late = late.alias("z")
    exists = base.join(
        other_any,
        (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
        & (F.col("x.l_suppkey") != F.col("y.l_suppkey")),
        "left_semi",
    )
    not_exists = exists.join(
        other_late,
        (F.col("x.l_orderkey") == F.col("z.l_orderkey"))
        & (F.col("x.l_suppkey") != F.col("z.l_suppkey")),
        "left_anti",
    )
    s = load_table(spark, SF_DIR, "supplier").select("s_suppkey", "s_name")
    literal = {
        (r["s_name"], r["numwait"])
        for r in not_exists.join(s, F.col("x.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .collect()
    }
    rewrite = {
        (r["s_name"], r["numwait"])
        for r in REGISTRY["q21_sole_late_supplier"].builder(spark, SF_DIR).collect()
    }
    assert literal == rewrite
