"""Lloyd's k-means over an embedding column — the iterative-algorithm
pattern on DataFrames.

Each iteration is two jobs: (1) assign — a ZERO-SHUFFLE narrow map
over the corpus: the k driver-resident centroids are folded into a
literal array-of-structs and the per-row argmin is computed with
``transform`` + ``array_min`` inside whole-stage codegen (no
crossJoin, no window, no exchange — at 100 TB with k=32 the old
window-rank formulation shuffled 32× the corpus WITH vector payloads
per iteration), (2) recompute — posexplode + groupBy(cluster, dim)
mean, collected to the driver. Collecting k × dim aggregated doubles
per round is O(kB) regardless of corpus size, and rebuilding the
centroid literals each round TRUNCATES the lineage — the classic
exponential-plan trap in iterative Spark jobs never forms, with no
checkpoint directory needed. The corpus itself is cached once and
never collected.

Deterministic by construction: init is the k vectors with the
smallest md5(vec_id) — a hash-spread seed, so id-ordered corpora
(where consecutive ids are near-duplicates or cluster together, the
common case for crawl shards and sorted exports) still seed from k
spread-out points instead of k neighbors, while staying fully
deterministic. Distance ties break on the lower cell id (struct
ordering of (dist, cell_id) under array_min), and per-cluster means
are exact decimal sums divided as doubles — independent of partition
order, so two runs produce identical assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans"]


def _cells_literal(cents: list[tuple[int, list[float]]]) -> F.Column:
    """The k centroids as ONE literal array<struct<cell_id,centroid>>
    expression — driver-side constants, zero tasks to distribute."""
    return F.array(
        *[
            F.struct(
                F.lit(int(cid)).cast("bigint").alias("cell_id"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("centroid"),
            )
            for cid, vec in cents
        ]
    )


def _assign(
    vectors: DataFrame,
    cents: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Nearest centroid per vector by squared euclidean distance —
    map-side argmin over the literal centroid array. ``array_min`` on
    (dist, cell_id) structs reproduces the (dist asc, cell_id asc)
    ranking with no shuffle and no row multiplication."""
    cells = _cells_literal(cents)

    def sqdist(c):
        return F.aggregate(
            F.zip_with(
                F.col(vec_col),
                c["centroid"],
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    best = F.array_min(
        F.transform(
            cells,
            lambda c: F.struct(
                sqdist(c).alias("dist"), c["cell_id"].alias("cell_id")
            ),
        )
    )
    return vectors.withColumn("__best", best).select(
        id_col,
        vec_col,
        F.col("__best")["cell_id"].alias("cell_id"),
        F.col("__best")["dist"].alias("dist"),
    )


def kmeans(
    vectors: DataFrame,
    k: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``n_iter`` Lloyd iterations; returns (vec_id, cell_id, dist)
    final assignments. ``dist`` is the squared euclidean distance to
    the final centroid (sum over all rows = inertia)."""
    corpus = vectors.select(id_col, vec_col).cache()

    # hash-spread seeding: k smallest md5(id) — deterministic, but
    # uncorrelated with id order, so sorted/clustered corpora don't
    # seed all k centroids from one neighborhood (id tiebreak keeps
    # the seed total even under md5 collisions)
    init = (
        corpus.orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .limit(k)
        .select(F.col(vec_col).alias("centroid"))
        .collect()
    )
    cents = [
        (i + 1, [float(x) for x in row["centroid"]])
        for i, row in enumerate(init)
    ]

    for _ in range(n_iter):
        assigned = _assign(corpus, cents, id_col, vec_col)
        # exact decimal mean per (cluster, dim): partition-order
        # independent, so reruns converge to identical centroids
        new = (
            assigned.select(
                "cell_id", F.posexplode(vec_col).alias("dim", "val")
            )
            .groupBy("cell_id", "dim")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(28,10)")).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias("cval")
            )
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in new:
            by_cell.setdefault(r["cell_id"], {})[r["dim"]] = r["cval"]
        # empty clusters keep their previous centroid
        cents = [
            (
                cid,
                [v for _, v in sorted(by_cell[cid].items())]
                if cid in by_cell
                else vec,
            )
            for cid, vec in cents
        ]

    return _assign(corpus, cents, id_col, vec_col)
