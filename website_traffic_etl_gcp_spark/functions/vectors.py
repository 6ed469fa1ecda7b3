"""Vector (array<double>) column math — pure Catalyst expressions.

``zip_with`` + ``aggregate`` keep the arithmetic JVM-side; no UDF, no
serialization. Used by the similarity-search and embedding-dedup
operators. At 100 TB these expressions run inside whole-stage codegen
per row; the expensive part is pair generation, which the operators
bound via bucketing (see operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    # Element casts to double BEFORE multiplying: embedding columns are
    # float32, and float32 products lose ~1e-8 — enough to flip top-k
    # ranks vs a double-computing engine.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
