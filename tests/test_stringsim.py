"""Ed-Join (operators/stringsim.py): prefix-filtered edit-distance
self-join must return EXACTLY the brute-force Levenshtein pairs —
the filter is an optimization, never an approximation."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from website_traffic_etl_gcp_spark.operators.stringsim import edjoin_pairs

from .conftest import SF_DIR


def _brute(spark, df, max_dist):
    a = df.select(F.col("id").alias("id_l"), F.col("text").alias("t_l"))
    b = df.select(F.col("id").alias("id_r"), F.col("text").alias("t_r"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_l") < F.col("id_r"))
        .withColumn("distance", F.levenshtein("t_l", "t_r"))
        .filter(F.col("distance") <= max_dist)
        .select("id_l", "id_r", "distance")
    )


def _pairs(df):
    return {(r["id_l"], r["id_r"], r["distance"]) for r in df.collect()}


def test_edjoin_matches_bruteforce_with_planted_neardups(spark):
    rng = random.Random(7)
    alphabet = "abcdefgh"
    base = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(8, 16)))
        for _ in range(120)
    ]
    rows = []
    for i, s in enumerate(base):
        rows.append((i * 10, s))
        if i % 3 == 0:  # plant a 1-2 edit variant
            pos = rng.randrange(len(s))
            t = s[:pos] + rng.choice(alphabet) + s[pos + 1 :]
            if i % 6 == 0:
                t = t[:-1]  # second edit: deletion
            rows.append((i * 10 + 1, t))
    df = spark.createDataFrame(rows, "id long, text string")
    got = _pairs(edjoin_pairs(df, "id", "text", max_dist=2))
    want = _pairs(_brute(spark, df, 2))
    assert got == want
    assert len(want) >= 20  # the plant actually produced near-dups


def test_edjoin_short_string_completeness(spark):
    """Strings with <= d*q distinct bigrams can share ZERO grams yet
    be within distance d — the broadcast short-set fallback must
    catch them (e.g. 'ab' vs 'cd' is distance 2 with no common
    bigram)."""
    rows = [(1, "ab"), (2, "cd"), (3, "abcd"), (4, "x"), (5, "xy")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = _pairs(edjoin_pairs(df, "id", "text", max_dist=2))
    want = _pairs(_brute(spark, df, 2))
    assert got == want
    assert (1, 2, 2) in got  # the zero-overlap pair specifically


def test_edjoin_exact_duplicates_distance_zero(spark):
    rows = [(1, "same text"), (2, "same text"), (3, "different!")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = _pairs(edjoin_pairs(df, "id", "text", max_dist=1))
    assert (1, 2, 0) in got
    assert all(p[:2] != (1, 3) for p in got)


def test_edjoin_on_part_names(spark):
    """Real corpus smoke: part names at sf0.001 — agreement with brute
    force and a plan with no cartesian product on the main path."""
    part = spark.read.parquet(f"{SF_DIR}/part.parquet").select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("text")
    )
    got = _pairs(edjoin_pairs(part, "id", "text", max_dist=2))
    want = _pairs(_brute(spark, part, 2))
    assert got == want
