"""Slowly-changing-dimension (SCD type 2) change application.

The reference job's whole purpose is applying a fresh extract over a
stored table (S3 feed wins per cell, `/root/reference/gule_test_job.py:
124-156`) — but it keeps no history: every run overwrites the previous
CSV. ``scd2_apply`` is the history-preserving version of that upsert a
warehouse ETL actually needs: applying a change batch to a dimension
snapshot yields, per key, a closed-out prior version plus a new current
version, while untouched keys pass through.

Spark-first design: one broadcast left join of the snapshot against the
(much smaller) change-batch key set classifies every base row; inserts
and new versions come straight from the change batch via union — no
window, no per-key loop, no full-outer join. At 100 TB the snapshot
never shuffles when the change batch broadcasts; with a large change
batch the left join degrades gracefully to one sort-merge shuffle on
the key, which is the floor for any keyed merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    tracked: list[str],
    version_col: str = "version",
    current_col: str = "is_current",
) -> DataFrame:
    """Apply ``changes`` (one row per key, new values for ``tracked``
    columns) to ``base`` (the current snapshot, one row per key).

    Output columns: ``key``, ``tracked...``, ``version_col`` in
    {'base', 'closed', 'updated'}, ``current_col`` boolean:

    * keys absent from ``changes``            -> 1 row  ('base',   true)
    * keys present: prior values              -> 1 row  ('closed', false)
    *               new values from the batch -> 1 row  ('updated', true)
    * keys only in ``changes`` (inserts)      -> 1 row  ('updated', true)

    A change row whose tracked values all equal the base row is still a
    new version (the caller pre-filters no-op changes if undesired).
    """
    # One broadcast LEFT join classifies every base row (Spark cannot
    # broadcast the build side of a full-outer join, and doesn't need
    # to here: keys only in `changes` are inserts, emitted from the
    # change batch directly without touching base).
    marker = changes.select(F.col(key).alias("__ck"))
    joined = base.join(F.broadcast(marker), base[key] == F.col("__ck"), "left")

    untouched = (
        joined.filter(F.col("__ck").isNull())
        .select(key, *tracked)
        .withColumn(version_col, F.lit("base"))
        .withColumn(current_col, F.lit(True))
    )
    closed = (
        joined.filter(F.col("__ck").isNotNull())
        .select(key, *tracked)
        .withColumn(version_col, F.lit("closed"))
        .withColumn(current_col, F.lit(False))
    )
    fresh = (
        changes.select(key, *tracked)
        .withColumn(version_col, F.lit("updated"))
        .withColumn(current_col, F.lit(True))
    )
    return untouched.unionByName(closed).unionByName(fresh)
