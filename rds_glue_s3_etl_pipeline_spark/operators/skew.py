"""Skew-resilient join (100 TB hardening, SURVEY §4).

AQE's skew-join split handles sort-merge skew automatically; salting
is the explicit fallback for the cases AQE can't fix (e.g. a single
hot key inside one partition of a shuffled hash join, or pre-Spark-3
clusters). Kept as a first-class operator so pipelines can opt in per
join: replicate the small side SALT_N ways, scatter the big side's hot
keys across the replicas, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_n: int = 8,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with ``salt_n``-way salting.

    The big side gets a random-but-deterministic salt from a hash of
    its full row (xxhash64 of all columns mod salt_n) so hot keys
    spread across salt_n reduce partitions; the small side is
    replicated salt_n times (explode), which is safe precisely because
    the small side is small. Output equals the unsalted join
    (column-for-column), verified in tests.

    Only ``inner`` and ``left`` are supported: with right/full outer
    joins an unmatched small-side row would survive once per salt
    replica (salt_n duplicates), so those modes are rejected rather
    than silently wrong.
    """
    if salt_n < 1:
        raise ValueError("salt_n must be >= 1")
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how in {{'inner','left'}}, got {how!r}: "
            "outer modes would duplicate unmatched replicated small-side rows"
        )
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_n))
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")


# Row gate for intentional broadcasts of derived maps (dup-cluster
# assignments, survivor lists). 4M two-long rows is a ~100-200 MB
# broadcast relation — comfortably inside a multi-GB executor but far
# above autoBroadcastJoinThreshold, which is WHY these sites hint
# explicitly. Above the gate the size argument ("the map is smaller
# than the corpus by the dup rate") has empirically failed, so the
# join falls back to a plain shuffled hash join instead of OOMing the
# driver with a giant broadcast.
BROADCAST_ROW_GATE = 4_000_000


def gated_broadcast(df: DataFrame, max_rows: int = BROADCAST_ROW_GATE) -> DataFrame:
    """``F.broadcast(df)`` if ``df`` has at most ``max_rows`` rows,
    else ``df`` unchanged — enforcing a broadcast-size *argument*
    instead of assuming it.

    The probe is ``limit(max_rows + 1).count()``: CollectLimit stops
    scanning once the cap is exceeded, so an over-size side pays a
    bounded partial scan, never a full count. Callers should pass a
    frame whose recompute lineage is short (checkpointed upstream, as
    the star-contraction cluster maps are) since the probe executes a
    separate job from the join itself.

    Driver-local fast path: a frame whose optimized plan is already a
    LocalRelation (the CC local union-find's createDataFrame output —
    the common case at bench scale) has a statically known row count,
    so the gate costs NO job at all.
    """
    local_rows = _local_relation_rows(df)
    if local_rows is not None:
        return F.broadcast(df) if local_rows <= max_rows else df
    if df.limit(max_rows + 1).count() <= max_rows:
        return F.broadcast(df)
    return df


def _local_relation_rows(df: DataFrame) -> int | None:
    """Row count if ``df``'s optimized plan is a driver-local relation
    (createDataFrame output), known without running a job; None for
    anything distributed or on any reflection hiccup."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        if plan.getClass().getSimpleName() == "LocalRelation":
            return plan.data().size()
    except Exception:
        return None
    return None
