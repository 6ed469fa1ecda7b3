"""Distributed PCA via one exact-integer covariance aggregation.

The classic scale shape for dimensionality reduction over a 100 TB
embedding corpus (whitening before ANN, OPQ-style rotation, variance
audits): the ONLY corpus-wide work is accumulating the d(d+1)/2
second-moment sums and the d first-moment sums — both map-side
combinable groupBys whose shuffle is O(d²) rows total, independent of
corpus size. The d×d covariance (64×64 here → 2 080 upper-triangle
cells) collects to the driver, where the eigendecomposition is a
trivial dense solve — exactly the bounded-driver-state pattern the PQ
codebook trainer uses (operators/pq.py:train_codebooks).

Determinism: every per-row product is floored to an integer at 1e9
scale BEFORE aggregation, so the moment sums are exact int64 and
partition-order independent; the covariance assembled from them is
bit-identical on every run, hence so is numpy's eigh output. Each
eigenvector's sign is pinned (largest-|component| entry forced
positive) so even the ±v ambiguity is fixed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MOMENT_SCALE = 1_000_000_000  # 1e9 — the repo's exact-sum convention


def moment_sums(
    emb: DataFrame, dim: int, vec_col: str = "embedding"
) -> tuple[int, list[int], dict[tuple[int, int], int]]:
    """(n, s1[d], s11{(i,j): int for i<=j}) — exact integer moment
    sums: s1_i = Σ floor(x_i·1e9), s11_ij = Σ floor(x_i·x_j·1e9).
    Two aggregations; the pair explode emits d(d+1)/2 rows per vector
    that partial aggregation collapses to d(d+1)/2 per PARTITION
    before the (tiny) shuffle."""
    xd = lambda c: c.cast("double")  # noqa: E731
    ex = emb.select(F.posexplode(F.col(vec_col)).alias("i", "x"))
    first = (
        ex.groupBy("i")
        .agg(
            F.sum(F.floor(xd(F.col("x")) * MOMENT_SCALE).cast("bigint"))
            .alias("s1"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .collect()
    )
    n = first[0]["n"] if first else 0
    s1 = [0] * dim
    for r in first:
        s1[r["i"]] = r["s1"]
    pairs = (
        emb.select(
            F.col(vec_col).alias("v"),
            F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("i"),
        )
        .select(
            "i",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("i")),
                    lambda j: F.struct(
                        j.alias("j"),
                        F.floor(
                            xd(F.element_at(F.col("v"), F.col("i") + 1))
                            * xd(F.element_at(F.col("v"), j + 1))
                            * MOMENT_SCALE
                        )
                        .cast("bigint")
                        .alias("p"),
                    ),
                )
            ).alias("jp"),
        )
        .select("i", F.col("jp")["j"].alias("j"), F.col("jp")["p"].alias("p"))
        .groupBy("i", "j")
        .agg(F.sum("p").alias("s11"))
        .collect()
    )
    s11 = {(r["i"], r["j"]): r["s11"] for r in pairs}
    return n, s1, s11


def covariance(
    n: int, s1: list[int], s11: dict[tuple[int, int], int], dim: int
):
    """Dense symmetric covariance (numpy d×d) from the exact integer
    moments: C_ij = (s11_ij/1e9)/n − μ_i·μ_j, μ_i = (s1_i/1e9)/n."""
    import numpy as np

    mu = np.array([(x / MOMENT_SCALE) / n for x in s1])
    c = np.zeros((dim, dim))
    for (i, j), v in s11.items():
        m = (v / MOMENT_SCALE) / n
        c[i, j] = c[j, i] = m
    return c - np.outer(mu, mu)


def eig_components(cov, n_components: int):
    """(evals_desc, components[n_components × d]) — eigenvalues sorted
    descending, each kept eigenvector sign-pinned so its
    largest-|component| entry is positive (kills the ±v ambiguity)."""
    import numpy as np

    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals = evals[order]
    evecs = evecs[:, order]
    comps = []
    for k in range(n_components):
        v = evecs[:, k]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append(v)
    return evals, np.array(comps)


def total_variance_micro(n: int, s1: list[int], s2_diag: list[int]) -> int:
    """Σ_i round(var_i · 1e9) as an exact int — var_i computed in the
    EXACT double-op order the SQL oracle uses:
    (s2/1e9)/n − ((s1/1e9)/n)·((s1/1e9)/n), half-up rounding (both
    engines round ties away from zero; variances are ≥ 0)."""
    import math

    tot = 0
    for s1_i, s2_i in zip(s1, s2_diag):
        m1 = (s1_i / MOMENT_SCALE) / n
        v = (s2_i / MOMENT_SCALE) / n - m1 * m1
        tot += int(math.floor(v * MOMENT_SCALE + 0.5))
    return tot


def pca_prefilter_topk(
    corpus: DataFrame,
    queries: DataFrame,
    comps,
    k: int,
    rerank_mult: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Dimension-reduced ANN prefilter: project unit vectors onto the
    P sign-pinned principal components (a pure map — the P×d matrix
    rides as literals inside codegen, no join), rank candidates by
    P-dim projected squared distance, and exactly re-rank only the
    k×rerank_mult shortlist's raw vectors. The pair scan is still
    O(corpus × |queries|) like brute force, but each evaluation is
    P-dim (d/P× cheaper — 4× at P=16, d=64) and the full-width
    vectors are touched only for the bounded shortlist join: the
    classic PCA prefilter trade (cheaper per-pair, no index build or
    shuffle at all). Returns (query_id, cand_id, cosine, rank)."""
    from pyspark.sql import Window

    from ..functions.vectors import cosine

    comp_lits = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in row])
            for row in comps
        ]
    )

    def _proj(col_name: str) -> F.Column:
        sq = F.aggregate(
            F.col(col_name),
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
        nrm = F.sqrt(sq)
        return F.transform(
            comp_lits,
            lambda c: F.aggregate(
                F.zip_with(
                    F.col(col_name), c, lambda x, w: x.cast("double") * w
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            )
            / nrm,
        )

    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        _proj(vec_col).alias("cproj"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _proj(vec_col).alias("qproj"),
    )
    pdist = F.round(
        F.aggregate(
            F.zip_with(
                F.col("cproj"), F.col("qproj"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.col("pdist"), F.col("cand_id")
    )
    shortlist = (
        c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", pdist.alias("pdist"))
        .withColumn("rank", F.row_number().over(ws))
        .filter(F.col("rank") <= k * rerank_mult)
        .select("query_id", "cand_id")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv")
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    return (
        shortlist.join(cv, "cand_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
