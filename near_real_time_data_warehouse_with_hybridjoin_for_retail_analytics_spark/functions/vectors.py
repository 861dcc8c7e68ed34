"""Vector math over array<float> columns — Catalyst built-ins only.

The fold order in ``F.aggregate`` is the array's element order, so the
double arithmetic is deterministic for a given vector pair regardless
of partitioning. (Cross-engine bitwise equality of the *score* is still
not guaranteed — oracle-checked queries emit ids/ranks, not floats.)
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
