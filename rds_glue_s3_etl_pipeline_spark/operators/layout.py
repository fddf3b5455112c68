"""Data-layout operators: Z-order (Morton) clustering keys.

The reference writes its output as one unsorted CSV object
(`/root/reference/gule_test_job.py:200-211`) — no layout thinking at
all. At 100 TB, layout IS performance: parquet row-group min/max
pruning only works when rows with nearby values are physically
adjacent. Sorting by a single column clusters that column only;
interleaving the bits of several columns (Z-order) gives every
interleaved column locality, so predicates on ANY of them skip files.

All bit-twiddling is built-in integer expressions (shiftleft/
shiftright/bitwise OR-AND) — JVM-side, codegen-friendly, no UDF. The
write path is then just ``df.repartitionByRange(n, zkey).
sortWithinPartitions(zkey).write.parquet(...)``: range-partitioning by
the Z-key gives disjoint Z-ranges per file, which is exactly the
DELTA-style OPTIMIZE ZORDER BY layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative ints:
    result bit 2i = bit i of ``a``, bit 2i+1 = bit i of ``b``."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def min_max_scale(df: DataFrame, col: str, out_col: str, bits: int = 16) -> DataFrame:
    """Scale an arbitrary numeric column onto [0, 2^bits) by value —
    min/max come from a broadcast 1-row aggregate, so the frame is
    scanned once extra regardless of size. Deterministic; good enough
    for layout purposes."""
    stats = df.agg(F.min(col).alias("__mn"), F.max(col).alias("__mx"))
    span = F.col("__mx") - F.col("__mn")
    scaled = (
        F.when(span == 0, F.lit(0))
        .otherwise(
            F.floor(
                (F.col(col) - F.col("__mn"))
                / (span + F.lit(1e-12))
                * F.lit((1 << bits) - 1)
            )
        )
        .cast("long")
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out_col, scaled)
        .drop("__mn", "__mx")
    )


def zorder_by(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16, out_col: str = "zkey"
) -> DataFrame:
    """Attach a Z-order key over two integer-valued columns (caller
    pre-scales floats via :func:`rank_normalize`). Sort/range-partition
    by ``out_col`` before writing to get multi-dimensional file
    pruning."""
    return df.withColumn(
        out_col, interleave_bits(F.col(col_a).cast("long"), F.col(col_b).cast("long"), bits)
    )
