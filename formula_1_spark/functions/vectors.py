"""Vector math over ``array<float>`` embedding columns — pure Spark
expressions (``zip_with`` + ``aggregate`` left-folds), no UDFs.

Determinism contract: elements are cast float→double (exact), products and
sums run in double in array order (left fold), so results are
bit-identical to the DuckDB oracle's ``list_reduce(list_transform(...))``
over the same data — and invariant to Spark partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
