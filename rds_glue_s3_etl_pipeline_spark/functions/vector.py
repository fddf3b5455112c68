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


def sq8_dequantize(vec, mins: Column, maxs: Column) -> Column:
    """Scalar-quantize each dimension to an 8-bit code against per-dim
    [min, max] bounds, then immediately dequantize — the value a scan
    over an SQ8-compressed index sees. ``mins``/``maxs`` are (small)
    array literals: the codebook, trainable on a sample and broadcast.

    All arithmetic is IEEE double add/sub/mul/div + floor (no libm),
    so the result is bit-identical across engines; a constant
    dimension (max == min) dequantizes to that constant.
    """
    v = as_double_array(vec)

    def deq(x, i):
        mn = F.element_at(mins, i + F.lit(1))
        mx = F.element_at(maxs, i + F.lit(1))
        rng = mx - mn
        code = F.floor(((x - mn) / rng) * F.lit(255.0) + F.lit(0.5))
        return F.when(rng == F.lit(0.0), mn).otherwise(
            mn + (code * rng) / F.lit(255.0)
        )

    return F.transform(v, deq)


def l2_distance_sq(a, b) -> Column:
    a, b = as_double_array(a), as_double_array(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
