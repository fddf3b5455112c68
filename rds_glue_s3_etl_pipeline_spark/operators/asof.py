"""As-of join (J6): each left row picks the latest right row with
``right.ts <= left.ts`` within the same key.

The reference has no temporal operator (its only order-dependent pick
is first-match at ``gule_test_job.py:131-132``); this is part of the
engine's extension surface for the ``events`` table.

Spark lacks a native as-of join. A naive non-equi join
(``l.ts >= r.ts``) is O(N×M) per key; instead we use the union-sort
trick: tag both sides, union them, and run one ``last(value, ignorenulls)``
window per key ordered by time. Cost = a single shuffle on the key +
sort within partitions — the same cost as any windowed aggregation, and
it scales linearly with data size regardless of match distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    value_cols: list[str] | None = None,
    tie_col: str | None = None,
) -> DataFrame:
    """Return ``left`` with, for each ``value_cols`` entry ``v``, a new
    column ``asof_<v>`` holding the latest ``right.v`` at or before the
    left row's timestamp (same ``on`` key). Rows with no prior right
    row get NULL.

    At equal timestamps the right row is considered visible to the left
    row (<=, matching e.g. pandas ``merge_asof`` default).
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, ts)]

    lhs = left.withColumn("__side", F.lit(0))
    for v in value_cols:
        lhs = lhs.withColumn(f"__rv_{v}", F.lit(None).cast(dict(right.dtypes)[v]))
    rhs = right.select(
        on,
        ts,
        F.lit(1).alias("__side"),
        *[F.col(v).alias(f"__rv_{v}") for v in value_cols],
    )
    # Align schemas: right side lacks left's payload columns.
    for c in left.columns:
        if c not in (on, ts):
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    rhs = rhs.select(*lhs.columns)

    unioned = lhs.unionByName(rhs)
    order = [F.col(ts).asc(), F.col("__side").desc()]
    if tie_col is not None:
        order.append(F.col(tie_col).asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for v in value_cols:
        unioned = unioned.withColumn(
            f"asof_{v}", F.last(f"__rv_{v}", ignorenulls=True).over(w)
        )
    keep = [c for c in left.columns] + [f"asof_{v}" for v in value_cols]
    return unioned.filter(F.col("__side") == 0).select(*keep)
