"""Trigram KN smoothing: distributional sanity (probabilities in
(0,1], discounted mass conserved) and a hand-computed planted case."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.plans.documents import (
    KN_DISCOUNT,
    trigram_kn_prob,
)

from .conftest import SF_DIR


def test_trigram_kn_probabilities_valid(spark):
    rows = trigram_kn_prob(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 < r["p_kn"] <= 1.0, r
        assert 0.0 < r["p_kn_mid"] <= 1.0, r
        # interpolation: the conditional never exceeds the raw MLE
        # plus the full backoff mass
        assert r["c123"] >= 1


def test_trigram_kn_hand_computed(spark, tmp_path):
    """Corpus = 'a b c' ×3 and 'a b d' ×1 (one doc each occurrence).
    tri: (a,b,c):3, (a,b,d):1. c12(a,b)=4, N1+(ab·)=2.
    mid types: (b,c):1, (b,d):1 → n_mid_ctx(b)=2, N1+(b·)=2.
    cont: n1_bwd(c)=1, n1_bwd(d)=1; n_types=2.
    P_mid(c|b) = (1-D)/2 + (D·2/2)·(1/2) = 0.125 + 0.375 = 0.5
    P(c|a,b) = (3-D)/4 + (D·2/4)·0.5 = 0.5625 + 0.1875 = 0.75
    P(d|a,b) = (1-D)/4 + 0.375·0.5 = 0.0625 + 0.1875 = 0.25
    (sums to 1 exactly — KN conserves the discounted mass)."""
    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(3)] + [(3, "a b d")],
        "doc_id bigint, text string",
    )
    out = str(tmp_path / "documents.parquet")
    docs.write.parquet(out)
    # trigram_kn_prob loads via the catalog: write a mini sf_dir
    rows = trigram_kn_prob(spark, str(tmp_path)).collect()
    by_tri = {(r["w1"], r["w2"], r["w3"]): r for r in rows}
    assert by_tri[("a", "b", "c")]["c123"] == 3
    assert by_tri[("a", "b", "c")]["p_kn"] == pytest.approx(0.75)
    assert by_tri[("a", "b", "d")]["p_kn"] == pytest.approx(0.25)
    assert by_tri[("a", "b", "c")]["p_kn_mid"] == pytest.approx(0.5)
    assert KN_DISCOUNT == 0.75


def test_doc_lm_perplexity_tri_hand_computed(spark, tmp_path):
    """Corpus: doc0 = 'a b c a b c' (trigrams abc, bca, cab, abc),
    doc1 = 'a b d'. Corpus counts: abc:2, bca:1, cab:1, abd:1; context
    counts c12: ab:3, bc:1, ca:1; V=4. Expected per-doc cross-entropy
    recomputed here with the SAME micro-nat rounding the engine and
    oracle share, so the assertion is exact, not approx-to-a-model."""
    import math

    from website_traffic_etl_gcp_spark.plans.selection import (
        doc_lm_perplexity_tri,
    )

    docs = spark.createDataFrame(
        [(0, "a b c a b c"), (1, "a b d")],
        "doc_id bigint, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in doc_lm_perplexity_tri(spark, str(tmp_path)).collect()
    }

    def mn(x):
        return round(math.log(x) * 1e6)

    v = 4
    lp = {
        "abc": mn(2 + 1) - mn(3 + v),
        "bca": mn(1 + 1) - mn(1 + v),
        "cab": mn(1 + 1) - mn(1 + v),
        "abd": mn(1 + 1) - mn(3 + v),
    }
    ce0 = -(2 * lp["abc"] + lp["bca"] + lp["cab"]) / (4 * 1e6)
    ce1 = -lp["abd"] / (1 * 1e6)
    assert rows[0]["n_trigrams"] == 4
    assert rows[1]["n_trigrams"] == 1
    assert rows[0]["cross_entropy_nats"] == ce0
    assert rows[1]["cross_entropy_nats"] == ce1
    assert rows[0]["ppl"] == round(math.exp(ce0), 6)
    # a 2-token doc has no trigrams and is absent
    docs2 = spark.createDataFrame(
        [(0, "a b c"), (1, "a b")], "doc_id bigint, text string"
    )
    d2 = str(tmp_path / "d2")
    docs2.write.parquet(d2 + "/documents.parquet")
    out = doc_lm_perplexity_tri(spark, d2).collect()
    assert [r["doc_id"] for r in out] == [0]


def test_doc_lm_perplexity_tri_corpus_sanity(spark):
    from website_traffic_etl_gcp_spark.plans.selection import (
        doc_lm_perplexity_tri,
    )

    rows = doc_lm_perplexity_tri(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_trigrams"] >= 1
        assert r["ppl"] > 1.0  # add-one smoothing: never a perfect fit
        assert r["cross_entropy_nats"] > 0.0
