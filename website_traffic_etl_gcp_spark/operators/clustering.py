"""Lloyd's k-means over an embedding column — the iterative-algorithm
pattern on DataFrames.

Each iteration is two jobs: (1) assign — a ZERO-SHUFFLE narrow map
over the corpus: the k driver-resident centroids ride an Arrow-batched
``mapInPandas`` kernel computing the per-row argmin (no crossJoin, no
window, no exchange — at 100 TB with k=32 the old window-rank
formulation shuffled 32× the corpus WITH vector payloads per
iteration; the r13→r14 ``transform`` + ``array_min`` literal-struct
form had the same plan shape but evaluated k × dim interpreted
higher-order-function steps per row — the ~160 µs/row Catalyst-HOF
cost round 13 measured — across FIVE corpus passes per 4-iteration
query), (2) recompute — posexplode + groupBy(cluster, dim) mean,
collected to the driver: the partial (map-side) decimal aggregation
ships only k × dim × partitions rows through the exchange. Collecting
k × dim aggregated doubles per round is O(kB) regardless of corpus
size, and rebuilding the centroid closure each round TRUNCATES the
lineage — the classic exponential-plan trap in iterative Spark jobs
never forms, with no checkpoint directory needed. The corpus itself
is cached once and never collected.

The kernel is the bit-exact twin of the HOF form it replaces
(operators/semcell_pairs.py has the exactness contract): elements cast
to double, each centroid's squared distance accumulated left-to-right
over dimensions as (a − b)·(a − b) float64 adds, argmin scanning
centroids in ascending cell_id with strict-less updates — identical
to ``array_min`` over (dist, cell_id) structs, including the
lowest-cell tie-break and NaN-sorts-last double order.

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


def _assign(
    vectors: DataFrame,
    cents: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Nearest centroid per vector by squared euclidean distance — an
    Arrow-batched narrow map with the k centroids riding the closure.
    Scanning centroids in ascending cell_id with strict-less updates
    reproduces the (dist asc, cell_id asc) ``array_min`` ranking with
    no shuffle and no row multiplication; per-dimension accumulation
    is left-to-right float64, so dist values are bit-identical to the
    replaced HOF fold (see module docstring)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, DoubleType, StructField, StructType

    ordered = sorted(
        ((int(cid), np.asarray(vec, dtype=np.float64)) for cid, vec in cents),
        key=lambda cv: cv[0],
    )

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            vm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            best_d = best_c = None
            for cid, cv in ordered:
                acc = np.zeros(len(vm))
                for j in range(vm.shape[1]):
                    diff = vm[:, j] - cv[j]
                    acc += diff * diff
                if best_d is None:
                    best_d = acc
                    best_c = np.full(len(vm), cid, dtype=np.int64)
                else:
                    # strict < keeps the lowest cell_id on ties; the
                    # NaN clause mirrors Spark's total double order
                    # (NaN sorts greatest, NaN == NaN keeps first)
                    upd = (acc < best_d) | (
                        np.isnan(best_d) & ~np.isnan(acc)
                    )
                    best_d = np.where(upd, acc, best_d)
                    best_c = np.where(upd, cid, best_c)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "cell_id": best_c,
                    "dist": best_d,
                }
            )

    src = vectors.select(id_col, vec_col)
    schema = StructType(
        [
            src.schema[id_col],
            src.schema[vec_col],  # element type preserved: a float
            # corpus must keep float semantics in the recompute cast
            StructField("cell_id", LongType()),
            StructField("dist", DoubleType()),
        ]
    )
    return src.mapInPandas(fn, schema)


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
    from ..functions.partitioning import (
        CPU_HEAVY_MIN_PARTITION_BYTES,
        widen_narrow_input,
    )

    # the assign kernel makes n_iter+1 full passes over the cached
    # corpus — fan a narrow scan out to all cores BEFORE caching so
    # every pass runs wide (no-op on already-wide inputs; the one
    # fan-out shuffle is paid once, then cached)
    corpus = widen_narrow_input(
        vectors.select(id_col, vec_col),
        min_partition_bytes=CPU_HEAVY_MIN_PARTITION_BYTES,
    ).cache()

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
