"""Planted-duplicate fixtures: each dedup tier must find the planted
near/exact duplicates and not fabricate unrelated pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.operators import dedup as dd

BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while the sun sets slowly behind the tall green hills of summer"
)
NEAR = BASE.replace("slowly", "quickly")  # one-token edit
FAR = (
    "completely different content about spark query engines and "
    "distributed columnar execution with vectorized operators at scale"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE, "en", 1),
        (1, BASE.upper(), "en", 1),  # exact dup after normalization
        (2, NEAR, "en", 1),  # near dup
        (3, FAR, "en", 1),
        (4, "tiny", "en", 1),  # shorter than a shingle
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "bucket"])


def test_exact_groups(docs):
    groups = dd.exact_groups(docs).collect()
    by_canon = {r["canonical_id"]: r["n_docs"] for r in groups}
    assert by_canon[0] == 2  # 0 and 1 collapse
    assert by_canon[2] == 1 and by_canon[3] == 1 and by_canon[4] == 1


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = dd.ngram_jaccard_pairs(docs, F.lit("b"), threshold=0.5)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(0, 1)] == 1.0  # exact after normalization
    assert (0, 2) in got and 0.5 <= got[(0, 2)] < 1.0
    assert not any(3 in p or 4 in p for p in got)


def test_minhash_lsh_finds_near_dup(docs):
    sigs = dd.minhash_signatures(docs)
    pairs = {(r["doc_a"], r["doc_b"]) for r in dd.minhash_band_pairs(sigs).collect()}
    assert (0, 1) in pairs  # identical signatures always collide
    assert not any(3 in p or 4 in p for p in pairs)


def test_simhash_finds_near_dup(docs):
    fps = dd.simhash_fingerprints(docs)
    vals = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    assert vals[0] == vals[1]
    assert 0 <= vals[0] < 2**dd.SIMHASH_BITS
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dd.simhash_near_pairs(fps).collect()
    }
    assert pairs[(0, 1)] == 0
    assert (0, 3) not in pairs and (1, 3) not in pairs
