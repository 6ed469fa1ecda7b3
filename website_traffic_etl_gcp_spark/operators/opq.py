"""Optimized Product Quantization (OPQ) — Ge, He, Ke, Sun, "Optimized
Product Quantization for Approximate Nearest Neighbor Search" (CVPR
2013, public): learn an orthonormal rotation R so that rotated vectors
quantize with LOWER reconstruction error under the SAME per-subspace
codebook budget as plain PQ. Subspace independence is what PQ assumes
and real embeddings violate; the rotation redistributes variance so
the assumption costs less.

Scale shape (the PQ-trainer/PCA pattern — bounded driver state,
distributed measurement):

- TRAINING is driver-side numpy over a deterministic bounded sample
  (stride = n // cap, same contract as ``pq.train_codebooks``):
  alternating minimization between per-subspace Lloyd's on X·R and the
  orthogonal Procrustes update R = U·Vᵀ from SVD(Xᵀ·X̂). State is one
  d×d matrix + M×k×(d/M) codebook floats — corpus-size independent,
  exactly the state the PQ trainer already keeps.
- MEASUREMENT is distributed: the rotation rides as d×d literals
  inside whole-stage codegen (a pure map, like the PCA projection),
  and per-vector quantization error reuses the PQ assignment operator
  (broadcast argmin, no shuffle beyond the final scalar aggregate), so
  the corpus pass is one scan regardless of size.

Determinism: the sample is ``vec_id % stride == 0`` ordered by vec_id,
k-means seeds from the first k sample rows per subspace, numpy argmin
ties break to the first index, empty cells keep their previous
centroid, and SVD signs are pinned by forcing each U column's
largest-|x| component positive — rerun-identical end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pq import PQ_K, PQ_M, _unit, subvectors, _assign_codes

OPQ_ITERS = 16
OPQ_KMEANS_ITERS = 6
OPQ_TRAIN_SAMPLE_CAP = 2048


def _kmeans_subspaces(Y, m: int, k: int, n_iter: int):
    """Per-subspace Lloyd's over the n×d sample, all in numpy.
    Returns codebooks of shape (m, k, d//m)."""
    import numpy as np

    n, d = Y.shape
    d_sub = d // m
    books = np.empty((m, k, d_sub))
    for mm in range(m):
        S = Y[:, mm * d_sub:(mm + 1) * d_sub]
        C = S[:k].copy()  # deterministic seed: first k sample rows
        for _ in range(n_iter):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            for c in range(k):
                mask = a == c
                if mask.any():
                    C[c] = S[mask].mean(axis=0)
        books[mm] = C
    return books


def _reconstruct(Y, books):
    """Nearest-codeword reconstruction of each row of Y."""
    import numpy as np

    n, d = Y.shape
    m, k, d_sub = books.shape
    out = np.empty_like(Y)
    for mm in range(m):
        S = Y[:, mm * d_sub:(mm + 1) * d_sub]
        d2 = ((S[:, None, :] - books[mm][None, :, :]) ** 2).sum(axis=2)
        out[:, mm * d_sub:(mm + 1) * d_sub] = books[mm][
            np.argmin(d2, axis=1)
        ]
    return out


def train_opq(
    X,
    m: int = PQ_M,
    k: int = PQ_K,
    n_iter: int = OPQ_ITERS,
    kmeans_iters: int = OPQ_KMEANS_ITERS,
):
    """Alternating minimization on the (already unit-normalized) n×d
    sample X: Lloyd's on X·R, then the orthogonal Procrustes update.
    Returns (R, codebooks) with R orthonormal d×d and codebooks
    (m, k, d//m) trained on X·R."""
    import numpy as np

    n, d = X.shape
    R = np.eye(d)
    books = None
    for _ in range(n_iter):
        Y = X @ R
        books = _kmeans_subspaces(Y, m, k, kmeans_iters)
        Yhat = _reconstruct(Y, books)
        U, _, Vt = np.linalg.svd(X.T @ Yhat)
        # sign-pin: flip U columns (and V rows) so each U column's
        # largest-|x| entry is positive — SVD sign freedom removed
        for j in range(d):
            i = int(np.abs(U[:, j]).argmax())
            if U[i, j] < 0:
                U[:, j] = -U[:, j]
                Vt[j, :] = -Vt[j, :]
        R = U @ Vt
    return R, books


def sample_to_driver(
    emb: DataFrame,
    cap: int = OPQ_TRAIN_SAMPLE_CAP,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic bounded unit-normalized training sample — the
    same ``id % stride`` contract as pq.train_codebooks."""
    import numpy as np

    n = emb.count()
    stride = max(1, n // cap)
    rows = (
        (emb if stride == 1 else emb.filter(F.col(id_col) % stride == 0))
        .select(id_col, _unit(vec_col).alias("u"))
        .orderBy(id_col)
        .collect()
    )
    return np.array([r["u"] for r in rows], dtype=float)


def rotate_frame(
    emb: DataFrame,
    R,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, embedding=unit(v)·R) — Arrow-batched numpy matmul via
    ``mapInPandas``: a pure map, no join, no shuffle; each task
    multiplies its batch against the (tiny, closure-shipped) d×d
    matrix. A dense d×d rotation is the case the PCA-literal-expression
    trick does NOT fit: expressing it as d nested fold lambdas
    duplicates the normalization subtree d times over d² literals —
    the plan tree is O(d³) nodes and execution fell out of codegen
    (measured: the sf1 20k-vector pass ran minutes as expressions,
    <1 s as a batched matmul)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    Rb = np.asarray(R, dtype=float)
    id_field = emb.schema[id_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField(vec_col, ArrayType(DoubleType())),
        ]
    )

    def _rotate(batches):
        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype=float)
            n = np.linalg.norm(X, axis=1, keepdims=True)
            n[n == 0.0] = 1.0
            Y = (X / n) @ Rb
            yield pd.DataFrame({id_col: pdf[id_col], vec_col: list(Y)})

    return emb.select(id_col, vec_col).mapInPandas(_rotate, schema)


def books_to_frame(spark, books) -> DataFrame:
    """numpy (m, k, d_sub) codebooks → the (m, cell, centroid) frame
    the PQ operators broadcast (cells are 1-based like the Spark
    trainer's)."""
    rows = [
        (mm, cell + 1, [float(x) for x in books[mm][cell]])
        for mm in range(books.shape[0])
        for cell in range(books.shape[1])
    ]
    return spark.createDataFrame(rows, ["m", "cell", "centroid"]).select(
        F.col("m").cast("int").alias("m"),
        F.col("cell").cast("bigint").alias("cell"),
        F.col("centroid").cast("array<double>").alias("centroid"),
    )


def quantization_mse(
    emb: DataFrame,
    cents: DataFrame,
    dim: int,
    m: int = PQ_M,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean per-vector squared reconstruction error over the FULL
    corpus: one scan, broadcast argmin per subspace, one scalar
    aggregate — distributed measurement of the driver-trained model."""
    sub = subvectors(emb, dim, m, id_col, vec_col)
    a = _assign_codes(sub, cents, id_col)
    row = a.agg(
        (
            F.sum(F.col("dist").cast("decimal(28,12)")).cast("double")
            / (F.count(F.lit(1)) / m).cast("double")
        ).alias("mse")
    ).collect()[0]
    return float(row["mse"])
