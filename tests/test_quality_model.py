"""Trained quality classifier: the model must actually LEARN (AUC
floors on train and held-out halves), the integer solver must match
its own pure-Python definition step for step, and the feature edge
cases (short/empty docs) must keep every doc scoreable."""

from __future__ import annotations

from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.catalog import load_table
from website_traffic_etl_gcp_spark.operators import quality_model as qm
from website_traffic_etl_gcp_spark.plans.selection import (
    _qc_labels,
    _qc_train,
)

from .conftest import SF_DIR_ORACLE


def _auc(pairs: list[tuple[int, int]]) -> float:
    """Threshold-free AUC from (score, y) pairs — exact
    rank-sum form, ties counted half."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    wins = sum(
        (1.0 if p > n else 0.5 if p == n else 0.0)
        for p in pos
        for n in neg
    )
    return wins / (len(pos) * len(neg))


def test_classifier_learns_auc_floors(spark):
    """The distilled model must rank keep-docs above reject-docs well
    beyond chance on BOTH halves — the 'is this a trained model or a
    random projection' gate. Floors sit safely under the measured
    sf0.01 values (train 0.91, held-out 0.87)."""
    _, _, _, w = _qc_train(spark, SF_DIR_ORACLE)
    feats = qm.char_ngram_features(load_table(spark, SF_DIR_ORACLE, "documents"))
    scored = qm.score_documents(feats, w).join(
        _qc_labels(spark, SF_DIR_ORACLE), "doc_id"
    )
    rows = scored.select("doc_id", "score_micro", "y").collect()
    train = [(r["score_micro"], r["y"]) for r in rows if r["doc_id"] % qm.TRAIN_MOD == 0]
    held = [(r["score_micro"], r["y"]) for r in rows if r["doc_id"] % qm.TRAIN_MOD != 0]
    auc_tr, auc_ho = _auc(train), _auc(held)
    assert auc_tr >= 0.85, f"train AUC {auc_tr:.3f} below floor"
    assert auc_ho >= 0.78, f"held-out AUC {auc_ho:.3f} below floor"


def test_solver_matches_definition():
    """solve_weights on a tiny hand-built system reproduces the
    documented recurrence exactly (floor division, micro-units) —
    the invariant the SQL oracle's unrolled CTEs depend on."""
    a = [[5, 1, 2], [1, 4, 0], [2, 0, 7]]
    c = [3, 1, 2]
    w = qm.solve_weights(a, c)
    # replay the definition independently
    s = [sum(row) for row in a]
    ref = [0, 0, 0]
    for _ in range(qm.N_ITERS):
        ref = [
            ref[i]
            + (c[i] * qm.W_SCALE - sum(a[i][j] * ref[j] for j in range(3)))
            // s[i]
            for i in range(3)
        ]
        # row-sum preconditioning keeps every intermediate bounded:
        # |W| can never exceed (max_i c_i/s_i + 1) * K micro-units
        assert all(abs(x) < qm.W_SCALE * qm.N_ITERS for x in ref)
    assert w == ref
    # and the iterate approximates the real ridge solution: the
    # micro-unit residual is a ~1e-4 relative error on c·1e6 (~3e6)
    resid = [
        c[i] * qm.W_SCALE - sum(a[i][j] * w[j] for j in range(3))
        for i in range(3)
    ]
    assert all(abs(r) <= 2000 for r in resid), resid


def test_short_docs_get_intercept_only_features(spark):
    """Docs whose normalized text is under 3 chars produce no char
    3-grams — they must still appear with the intercept row so the
    score query covers EVERY doc (n_feats = 0, score = W[intercept])."""
    docs = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, "a much longer document body here")],
        "doc_id bigint, text string",
    )
    feats = qm.char_ngram_features(docs)
    rows = feats.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["b"], r["n"]))
    assert by_doc[1] == [(qm.INTERCEPT, 1)]
    assert by_doc[2] == [(qm.INTERCEPT, 1)]
    assert len(by_doc[3]) > 1
    w = list(range(qm.N_FEATURES))  # arbitrary distinct weights
    scored = {
        r["doc_id"]: r
        for r in qm.score_documents(feats, w).collect()
    }
    assert scored[1]["n_feats"] == 0
    assert scored[1]["score_micro"] == w[qm.INTERCEPT]
    assert scored[2]["score_micro"] == w[qm.INTERCEPT]


def test_feature_counts_are_capped(spark):
    docs = spark.createDataFrame(
        [(1, "z" * 500)], "doc_id bigint, text string"
    )
    feats = qm.char_ngram_features(docs).filter(
        F.col("b") != qm.INTERCEPT
    )
    mx = feats.agg(F.max("n")).collect()[0][0]
    assert mx == qm.COUNT_CAP  # 498 'zzz' grams, one bucket, capped


def test_model_registry_roundtrip_and_invalidation(spark, tmp_path):
    """Published weights are probed by scoring, keyed by corpus STATE
    (a regenerated corpus gets a different key), and strict mode
    raises when no model is published."""
    import os

    from pyspark.sql import functions as F

    from website_traffic_etl_gcp_spark.operators import quality_model as qm
    from website_traffic_etl_gcp_spark.plans.selection import _qc_weights

    sf = str(tmp_path / "sfQ")
    os.makedirs(sf)
    spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the common words appear here again and again doc "),
            F.col("id").cast("string"),
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("srcA").alias("source"),
        F.lit(50).alias("n_chars"),
    ).coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))

    assert qm.load_published_weights(sf) is None
    os.environ["SPARK_GRAFT_STRICT_INDEX"] = "1"
    try:
        import pytest

        with pytest.raises(RuntimeError, match="no published classifier"):
            _qc_weights(spark, sf)
    finally:
        del os.environ["SPARK_GRAFT_STRICT_INDEX"]

    w = _qc_weights(spark, sf)  # trains + publishes
    assert qm.load_published_weights(sf) == w
    # probe path returns the identical vector (and is pure file I/O)
    assert _qc_weights(spark, sf) == w
    # corpus state change -> different key -> no stale read
    p1 = qm.model_path(sf)
    with open(
        os.path.join(
            sf,
            "documents.parquet",
            [
                f
                for f in os.listdir(os.path.join(sf, "documents.parquet"))
                if f.endswith(".parquet")
            ][0],
        ),
        "ab",
    ) as fh:
        fh.write(b"x")
    assert qm.model_path(sf) != p1
    assert qm.load_published_weights(sf) is None
