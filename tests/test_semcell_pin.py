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
    HOT_CELL_FACTOR,
    SEM_PLANES,
    SEMDEDUP_CELL_CAP,
    _emb,
    semantic_cell_frame,
    skew_refine_cells,
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
        skew_refine_cells(semantic_cell_frame(emb, with_sig=True))
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
    # of the cap (sf10 measured max/expected = 4.2x under the global
    # scheme; the r11 skew split should land under HOT_CELL_FACTOR x)
    assert occ["max_occ"] <= 8 * SEMDEDUP_CELL_CAP


def test_skew_split_collapses_planted_hot_cell(spark):
    """Constructive proof of the r11 per-cell split: plant a corpus
    whose base scheme leaves one label-cell far above HOT_CELL_FACTOR
    x expected, and check skew_refine_cells deepens EXACTLY that cell
    (cold cells keep their ids) and spreads its members."""
    import random

    rng = random.Random(11)
    rows = []
    # 5 labels, 64 vectors, p=0 -> expected cell = 64/5 = 12.8; the
    # 60-vector label-cell is 4.7x expected (over the 2x trigger),
    # the four 1-vector labels are cold
    for i in range(60):  # hot label: diverse vectors, one label-cell
        rows.append((i, 0, [rng.uniform(-1, 1) for _ in range(64)]))
    for i in range(60, 64):
        rows.append((i, 1 + (i - 60), [rng.uniform(-1, 1) for _ in range(64)]))
    emb = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<float>"
    )
    base = semantic_cell_frame(emb, with_sig=True)
    refined = skew_refine_cells(base)
    b = {
        r["cell_id"]
        for r in base.select("cell_id").distinct().collect()
    }
    r = {
        r["cell_id"]
        for r in refined.select("cell_id").distinct().collect()
    }
    n, nl = 64, 5
    p = next(
        q for q in range(SEM_PLANES + 1)
        if n <= SEMDEDUP_CELL_CAP * nl * (1 << q)
    )
    expected = n / (nl * (1 << p))
    base_max = (
        base.groupBy("cell_id").count().agg(F.max("count")).collect()[0][0]
    )
    ref_max = (
        refined.groupBy("cell_id").count().agg(F.max("count")).collect()[0][0]
    )
    assert base_max > HOT_CELL_FACTOR * expected  # the plant worked
    assert ref_max < base_max  # the hot cell actually split
    assert len(r) > len(b)
    # cold cells under the line keep their ids bit-for-bit
    cold = [
        row["cell_id"]
        for row in base.groupBy("cell_id").count().collect()
        if row["count"] <= HOT_CELL_FACTOR * expected
    ]
    assert set(cold) <= r
