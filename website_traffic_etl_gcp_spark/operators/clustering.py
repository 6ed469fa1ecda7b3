"""Lloyd's k-means over an embedding column — the iterative-algorithm
pattern on DataFrames.

Each iteration is two jobs: (1) assign — a narrow map over the corpus
against BROADCAST centroids (k × dim floats, tiny at any corpus size),
(2) recompute — posexplode + groupBy(cluster, dim) mean, collected to
the driver. Collecting k × dim aggregated doubles per round is O(kB)
regardless of corpus size, and rebuilding the centroid frame from
literals TRUNCATES the lineage — the classic exponential-plan trap in
iterative Spark jobs never forms, with no checkpoint directory needed.
The corpus itself is cached once and never collected.

Deterministic by construction: init is the first k vectors by vec_id,
distance ties break on the lower cell id, and per-cluster means are
exact decimal sums divided as doubles — independent of partition
order, so two runs produce identical assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kmeans"]


def _assign(
    vectors: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Nearest centroid per vector by squared euclidean distance."""
    dist = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col("centroid"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy(id_col).orderBy(F.col("dist"), F.col("cell_id"))
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .select(id_col, vec_col, "cell_id", dist.alias("dist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
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
    spark = vectors.sparkSession
    corpus = vectors.select(id_col, vec_col).cache()

    init = (
        corpus.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).alias("centroid"))
        .collect()
    )
    cents = [
        (i + 1, [float(x) for x in row["centroid"]])
        for i, row in enumerate(init)
    ]

    for _ in range(n_iter):
        centroids = spark.createDataFrame(
            cents, ["cell_id", "centroid"]
        ).select(
            F.col("cell_id").cast("bigint").alias("cell_id"),
            F.col("centroid").cast("array<double>").alias("centroid"),
        )
        assigned = _assign(corpus, centroids, id_col, vec_col)
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

    centroids = spark.createDataFrame(cents, ["cell_id", "centroid"]).select(
        F.col("cell_id").cast("bigint").alias("cell_id"),
        F.col("centroid").cast("array<double>").alias("centroid"),
    )
    return _assign(corpus, centroids, id_col, vec_col)
