"""Event-analytics batch 2: cohort retention and aggregation-based
top-1-per-group (SURVEY §2 EXT over the ``events`` table).

The retention matrix is the standard product-analytics rollup; the
max_by query demonstrates the agg-only alternative to a ranking window
for "latest row per key" — one partial+final aggregation, no sort, no
window buffer, which is the shape to prefer at 100 TB when only the
top-1 is needed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load
from .registry import query

# --------------------------------------------------------------------------
# Cohort retention matrix.
# --------------------------------------------------------------------------

_Q103_ORACLE = """
WITH firsts AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
),
acts AS (
  SELECT e.user_id,
         epoch_ms(CAST(CAST(f.first_ts AS DATE) AS TIMESTAMP)) AS cohort_day_ms,
         CAST(FLOOR(date_diff('day', CAST(f.first_ts AS DATE), CAST(e.ts AS DATE)) / 7) AS BIGINT) AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_day_ms, week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM acts
GROUP BY cohort_day_ms, week_offset
"""


@query("q103_cohort_retention", oracle=_Q103_ORACLE, tags=("events", "agg", "EXT"))
def q103_cohort_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-seen day, counted as
    active per week offset since. Two aggregations keyed on user_id
    (first-seen then distinct-per-cell), so both shuffles hash the
    same key; the per-cell COUNT(DISTINCT) is partial-aggregated
    map-side. Day-level cohort labels avoid engine-specific
    week-start conventions."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    acts = e.join(firsts, "user_id").select(
        "user_id",
        F.unix_millis(
            F.col("first_ts").cast("date").cast("timestamp")
        ).alias("cohort_day_ms"),
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.col("first_ts").cast("date")) / 7
        )
        .cast("long")
        .alias("week_offset"),
    )
    return acts.groupBy("cohort_day_ms", "week_offset").agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )


# --------------------------------------------------------------------------
# Latest event per user via max_by (agg-based top-1-per-group).
# --------------------------------------------------------------------------

_Q104_ORACLE = """
SELECT user_id, event_id, event_type, ts_ms FROM (
  SELECT user_id, event_id, event_type,
         epoch_ms(ts) AS ts_ms,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t WHERE rn = 1
"""


@query("q104_latest_event_per_user", oracle=_Q104_ORACLE, tags=("events", "agg", "EXT"))
def q104_latest_event_per_user(spark, sf_dir):
    """Latest event per user WITHOUT a ranking window: max_by over a
    (ts, event_id) struct picks the top row inside a hash aggregation
    — partial aggregation on the map side means shuffle volume is one
    row per user, not one row per event (the window form shuffles and
    sorts every event). The oracle states the same semantics with
    ROW_NUMBER, which is how a SQL engine would write it."""
    e = load(spark, sf_dir, "events")
    ordk = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy("user_id").agg(
        F.max_by("event_id", ordk).alias("event_id"),
        F.max_by("event_type", ordk).alias("event_type"),
        F.unix_millis(F.max("ts")).alias("ts_ms"),
    )


# --------------------------------------------------------------------------
# Mergeable HLL sketches: per-slice sketch, union, no re-scan.
# --------------------------------------------------------------------------

_Q105_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS sketch_ok
FROM events GROUP BY event_type
UNION ALL
SELECT 'ALL' AS event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS sketch_ok
FROM events
"""


@query("q105_hll_sketch_union", oracle=_Q105_ORACLE, tags=("events", "agg", "A4", "EXT"))
def q105_hll_sketch_union(spark, sf_dir):
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    hll_sketch_agg / hll_union_agg): per-event-type user sketches are
    built in one pass, and the GLOBAL distinct-user estimate comes from
    unioning those sketch binaries — never re-scanning events. That
    merge step is the 100 TB pattern: per-partition/per-day sketches
    roll up to any coarser grain for free. Sketch bytes are
    engine-specific, so the oracle pins the exact counts and the query
    asserts in-band each estimate is within 5% of exact."""
    e = load(spark, sf_dir, "events")
    band = 0.05
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    typed = per_type.select(
        "event_type",
        F.col("exact_users").cast("long").alias("exact_users"),
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact_users"))
            <= F.col("exact_users").cast("double") * band
        ).alias("sketch_ok"),
    )
    global_exact = e.agg(F.countDistinct("user_id").alias("g_exact"))
    merged = (
        per_type.agg(F.hll_union_agg("sk").alias("gsk"))
        .crossJoin(F.broadcast(global_exact))
        .select(
            F.lit("ALL").alias("event_type"),
            F.col("g_exact").cast("long").alias("exact_users"),
            (
                F.abs(F.hll_sketch_estimate("gsk") - F.col("g_exact"))
                <= F.col("g_exact").cast("double") * band
            ).alias("sketch_ok"),
        )
    )
    return typed.unionByName(merged)


# --------------------------------------------------------------------------
# Bitmap-based EXACT distinct counts — mergeable like a sketch, exact
# like COUNT(DISTINCT).
# --------------------------------------------------------------------------

_Q107_ORACLE = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
FROM events GROUP BY event_type
"""


@query("q107_bitmap_distinct", oracle=_Q107_ORACLE, tags=("events", "agg", "A4", "EXT"))
def q107_bitmap_distinct(spark, sf_dir):
    """Exact distinct users per event type WITHOUT a COUNT(DISTINCT)
    shuffle of raw keys: user ids are packed into fixed-size bitmap
    buckets (bitmap_construct_agg over bit positions), partial bitmaps
    OR-merge across partitions, and popcounts sum per group. Shuffle
    volume is #buckets x #groups bitmaps, independent of row count —
    and unlike HLL (q105) the result is exact. This is the roll-up
    pattern for precomputed distinct-count cubes at 100 TB."""
    e = load(spark, sf_dir, "events")
    per_bucket = e.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("bkt")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm")
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bm")).cast("long").alias("exact_users"))
    )
