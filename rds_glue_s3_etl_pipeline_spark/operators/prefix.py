"""Distributed global ordering primitives (SURVEY §2.6 O1 at scale).

The reference preserves input order by iterating a pandas frame on one
core (``/root/reference/gule_test_job.py:125-163``). The naive Spark
translation — ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY
— moves every row to a single task (Spark even warns: "No Partition
Defined for Window operation"), which is exactly the single-core
pathology the engine exists to remove.

The scale-correct form is the classic two-pass prefix computation every
distributed sort uses:

1. range-partition on the order key (sampled boundaries — Spark's
   ``repartitionByRange``), sort within partitions;
2. one tiny job computes per-partition row counts / partial sums
   (#partitions rows — kilobytes at any data scale);
3. exclusive prefix offsets over those partials are broadcast back, and
   each partition independently adds ``offset + local_rank``.

Wall-clock is two scans + one range shuffle; no task ever sees more
than one partition of data, so the same plan holds at 100 TB with
thousands of partitions. The lineage between the two passes is pinned
by materializing the ranged frame (with its ``spark_partition_id``
stamped as a COLUMN) to managed-scratch parquet, so both jobs observe
identical partition boundaries AND nothing stays pinned in the block
manager after the query completes — the round-10 ANN-index lesson
(session residue from eager localCheckpoints in long-lived shared
sessions) applied to the prefix family. On a real cluster the same
call writes a job-scoped object-store prefix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__prefix_pid"
_LOCAL = "__prefix_local"
_OFFSET = "__prefix_offset"


def _ranged(df: DataFrame, order_cols, num_partitions: int | None):
    from ..scratch import parquet_checkpoint

    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # parquet_checkpoint, not localCheckpoint: _PID is materialized as a
    # COLUMN before the write, and every downstream window/groupBy keys
    # on that column value (never on physical partition identity), so
    # the read-back frame is correct under any re-split — and the
    # returned result frame carries no live lineage into pinned RDD
    # blocks (the session-residue class round 10 closed for the ANN
    # family; round-10 ADVICE flagged this path as reintroducing it).
    ranged = parquet_checkpoint(
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn(_PID, F.spark_partition_id()),
        "prefix_ranged_",
    )
    return ranged, cols


def _with_offsets(ranged: DataFrame, partials: DataFrame, partial_col: str):
    """Join exclusive prefix offsets (computed over the tiny
    per-partition partials frame) back onto the ranged data.

    The exclusive prefix is a triangular self-join + re-aggregation
    rather than an unpartitioned window: the partials frame has one row
    per partition (kilobytes at any scale), so the O(P^2) join is
    trivial, stays fully declarative, and avoids the single-partition
    WindowExec this module exists to eliminate (Catalyst folds away
    constant partitionBy keys, so there is no way to "partition" that
    window honestly)."""
    left = partials.select(_PID, F.col(partial_col))
    prior = partials.select(
        F.col(_PID).alias("__prior_pid"), F.col(partial_col).alias("__prior_val")
    )
    offsets = (
        left.join(F.broadcast(prior), F.col("__prior_pid") < F.col(_PID), "left")
        .groupBy(_PID)
        .agg(F.coalesce(F.sum("__prior_val"), F.lit(0)).alias(_OFFSET))
    )
    return ranged.join(F.broadcast(offsets), _PID)


def global_row_number(
    df: DataFrame,
    order_cols,
    out_col: str = "seq",
    num_partitions: int | None = None,
) -> DataFrame:
    """Total-order 1-based row number over ``order_cols`` without a
    single-partition window. ``order_cols`` must be a total order
    (include a unique tiebreaker) for deterministic output.
    """
    ranged, cols = _ranged(df, order_cols, num_partitions)
    counts = ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("__n"))
    local = F.row_number().over(Window.partitionBy(_PID).orderBy(*cols))
    return (
        _with_offsets(ranged.withColumn(_LOCAL, local), counts, "__n")
        .withColumn(out_col, (F.col(_OFFSET) + F.col(_LOCAL)).cast("long"))
        .drop(_PID, _LOCAL, _OFFSET)
    )


def grouped_row_number(
    df: DataFrame,
    part_cols,
    order_cols,
    out_col: str = "seq",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group 1-based row number over ``order_cols`` WITHIN each
    ``part_cols`` group, without any task ever holding a whole group —
    the partitioned-mode extension of :func:`global_row_number` for
    stratified ranking where one stratum can approach corpus size (a
    `row_number() OVER (PARTITION BY g ORDER BY ...)` window puts all
    of g in one task; a web corpus with an 80% 'en' stratum would put
    80% of 100 TB there).

    Same two-pass shape: range-partition on (part_cols + order_cols) —
    a mega-group spans many partitions but each partition holds a
    bounded slice; per-(partition, group) counts (≤ #partitions +
    #groups rows: a group adds a row only to partitions it spans);
    exclusive prefix offsets via a prior-partition join ON THE GROUP
    KEY (hash join — group count can exceed broadcast size); each
    partition adds offset + local rank independently.

    ``order_cols`` must totally order rows within a group (include a
    unique tiebreaker).
    """
    pc_names = list(part_cols)  # group key: plain column names only
    pc = [F.col(c) for c in pc_names]
    ranged, cols = _ranged(df, [*pc, *order_cols], num_partitions)
    counts = ranged.groupBy(_PID, *pc_names).agg(F.count(F.lit(1)).alias("__n"))
    prior = counts.select(
        *[F.col(c).alias(f"__prior_{c}") for c in pc_names],
        F.col(_PID).alias("__prior_pid"),
        F.col("__n").alias("__prior_n"),
    )
    cond = F.col("__prior_pid") < F.col(_PID)
    for c in pc_names:
        cond = cond & (F.col(f"__prior_{c}") == F.col(c))
    offsets = (
        counts.join(prior, cond, "left")
        .groupBy(_PID, *pc_names)
        .agg(F.coalesce(F.sum("__prior_n"), F.lit(0)).alias(_OFFSET))
    )
    local = F.row_number().over(
        Window.partitionBy(_PID, *pc_names).orderBy(*cols[len(pc):])
    )
    return (
        ranged.withColumn(_LOCAL, local)
        .join(offsets, [_PID, *pc_names])
        .withColumn(out_col, (F.col(_OFFSET) + F.col(_LOCAL)).cast("long"))
        .drop(_PID, _LOCAL, _OFFSET)
    )


def global_running_sum(
    df: DataFrame,
    order_cols,
    value: Column | str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running (inclusive-prefix) sum of ``value`` in
    ``order_cols`` order — same two-pass shape as
    :func:`global_row_number` with partial sums instead of counts.

    Sum ``value`` exactly (cast to decimal first for doubles) or the
    partial+offset recombination can differ from a serial sum.
    """
    ranged, cols = _ranged(df, order_cols, num_partitions)
    v = F.col(value) if isinstance(value, str) else value
    sums = ranged.groupBy(_PID).agg(F.sum(v).alias("__s"))
    local = F.sum(v).over(
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _with_offsets(ranged.withColumn(_LOCAL, local), sums, "__s")
        .withColumn(out_col, F.col(_OFFSET) + F.col(_LOCAL))
        .drop(_PID, _LOCAL, _OFFSET)
    )
