"""Vector math over ``ArrayType`` embedding columns — pure built-in
higher-order functions (``zip_with`` / ``aggregate``), JVM-side, no
UDFs: dot product, norms, cosine similarity.

Accumulation is an explicit left fold in DOUBLE so results are
deterministic and engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a, b) -> Column:
    a, b = as_double_array(a), as_double_array(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_sq(a) -> Column:
    a = as_double_array(a)
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def norm(a) -> Column:
    return F.sqrt(norm_sq(a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance_sq(a, b) -> Column:
    a, b = as_double_array(a), as_double_array(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
