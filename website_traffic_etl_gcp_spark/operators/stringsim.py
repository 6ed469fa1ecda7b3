"""Scalable string-similarity self-join (edit distance) — the Ed-Join
shape (Xiao, Wang & Lin, VLDB 2008): q-gram *prefix filtering* under a
global rarity order turns the quadratic all-pairs Levenshtein problem
into an inverted-index join over each string's few RAREST q-grams,
with exact Levenshtein verification only on the surviving candidates.

Why this scales where naive blocking does not:

- An edit operation destroys at most ``q`` q-gram tokens, so two
  strings within edit distance ``d`` share at least
  ``max(D_s, D_t) - d*q`` distinct q-grams (``D_x`` = distinct q-gram
  count). By the prefix-filter theorem, candidates that meet an
  overlap threshold ``tau`` must collide inside each string's first
  ``D - tau + 1`` grams under ANY global total order — here ascending
  global document frequency, so each string indexes only its
  ``d*q + 1`` rarest grams and hot grams (the df² blowup of a plain
  gram-inverted-index join) never enter the index.
- The length filter ``|len(s) - len(t)| <= d`` is applied before
  verification, and verification is Spark's built-in JVM-side
  ``levenshtein`` — no Python in the hot path.
- Strings with at most ``d*q`` distinct grams can satisfy the
  threshold with ZERO overlap; they are handled by a broadcast
  cross within that (tiny, length-bounded) set so completeness is
  unconditional, not probabilistic.

Everything here is one groupBy (global gram dfs), one window (per-id
rarity rank), one equi-join on prefix grams, and a distinct — all
shuffle-partitioned by gram/id, no driver-side loops, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _distinct_qgrams(df: DataFrame, id_col: str, text_col: str, q: int):
    """(id, text, gram) with DISTINCT per-id grams; strings shorter
    than ``q`` contribute their whole text as a single gram so they
    still participate in the index."""
    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - {q - 1}, 1)),"
            f" i -> substring({text_col}, i, {q}))"
        )
    )
    return df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_text"),
        F.explode(grams).alias("gram"),
    )


def edjoin_pairs(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """All pairs (id_l < id_r) with ``levenshtein(text_l, text_r) <=
    max_dist``, as ``(id_l, id_r, distance)``. Exact and complete —
    the prefix filter only prunes candidates that provably cannot
    qualify; every survivor is re-verified with exact Levenshtein."""
    grams = _distinct_qgrams(df, id_col, text_col, q)
    gram_df = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("gram_df"))
    ranked = grams.join(gram_df, "gram").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("_id").orderBy("gram_df", "gram")
        ),
    )
    prefix_len = max_dist * q + 1
    prefix = ranked.filter(F.col("rn") <= prefix_len).select(
        "_id", "_text", "gram"
    )

    left = prefix.select(
        F.col("_id").alias("id_l"), F.col("_text").alias("t_l"), "gram"
    )
    right = prefix.select(
        F.col("_id").alias("id_r"), F.col("_text").alias("t_r"), "gram"
    )
    cand = (
        left.join(right, "gram")
        .filter(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r", "t_l", "t_r")
        .distinct()
    )

    # zero-overlap-capable stragglers: <= d*q distinct grams means the
    # overlap threshold max(D_s, D_t) - d*q can reach 0 only if BOTH
    # sides are this short (the length filter forbids a short/long
    # qualifying pair), so a broadcast cross within the set suffices
    n_grams = grams.groupBy("_id", "_text").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    short = n_grams.filter(F.col("n_grams") <= max_dist * q).select(
        "_id", "_text"
    )
    short_cand = (
        short.select(F.col("_id").alias("id_l"), F.col("_text").alias("t_l"))
        .crossJoin(
            F.broadcast(
                short.select(
                    F.col("_id").alias("id_r"), F.col("_text").alias("t_r")
                )
            )
        )
        .filter(F.col("id_l") < F.col("id_r"))
    )

    return (
        cand.unionByName(short_cand)
        .distinct()
        .filter(
            F.abs(F.length("t_l") - F.length("t_r")) <= F.lit(max_dist)
        )
        .withColumn("distance", F.levenshtein("t_l", "t_r"))
        .filter(F.col("distance") <= F.lit(max_dist))
        .select("id_l", "id_r", "distance")
    )
