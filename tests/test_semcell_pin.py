"""Semantic-dedup cell-occupancy invariants, regression-pinned.

scripts/pin_semantic_cells.py measures these at sf10 (recorded in
SEMCELL_PIN_SF10.json: expected cell 312.5 ≤ cap 512, pairwork skew
1.43× uniform, 0.22% of corpus-quadratic); this test keeps the SAME
invariants enforced at test SF on every run so a cell-scheme change
that breaks the expectation bound or explodes skew fails CI, not a
round later at the benchmark."""

from __future__ import annotations

from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.plans.embeddings import (
    SEM_PLANES,
    SEMDEDUP_CELL_CAP,
    _emb,
    semantic_cell_frame,
)

from .conftest import SF_DIR_ORACLE

SKEW_BUDGET = 8.0


def test_cell_expectation_and_skew_bounds(spark):
    emb = _emb(spark, SF_DIR_ORACLE)
    n, nl = emb.agg(F.count(F.lit(1)), F.countDistinct("label")).collect()[0]
    p = next(
        (q for q in range(SEM_PLANES + 1)
         if n <= SEMDEDUP_CELL_CAP * nl * (1 << q)),
        SEM_PLANES,
    )
    expected = n / (nl * (1 << p))
    assert expected <= SEMDEDUP_CELL_CAP
    occ = (
        semantic_cell_frame(emb)
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.expr("c * (c - 1) / 2")).alias("pairs"),
            F.max("c").alias("max_occ"),
        )
        .collect()[0]
    )
    uniform_pairs = (nl * (1 << p)) * (expected * (expected - 1) / 2)
    if uniform_pairs > 0:
        assert occ["pairs"] / uniform_pairs <= SKEW_BUDGET, (
            f"within-cell pairwork {occ['pairs']} is "
            f"{occ['pairs'] / uniform_pairs:.1f}x the uniform "
            f"expectation {uniform_pairs:.0f} — cell scheme skew-broken"
        )
    # the self-join never sees a cell larger than a smallish multiple
    # of the cap (sf10 measured max/expected = 4.2x)
    assert occ["max_occ"] <= 8 * SEMDEDUP_CELL_CAP
