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
