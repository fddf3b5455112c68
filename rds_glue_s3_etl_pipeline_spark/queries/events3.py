"""Event-analytics batch 3 (SURVEY §2 EXT): hypertable-style OHLC
rollup, end-to-end dedup-keep-best, and ordered conversion-pattern
detection — three shapes a training-data/analytics user runs daily that
exercise first/last-in-bucket semantics, cluster→decision pipelines,
and sequence predicates over event time.

Scale notes per query in the docstrings; nothing here introduces a
global (unpartitioned) window or an all-pairs join.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.graph import connected_components_star
from .registry import O_DSUM, dsum, query

# --------------------------------------------------------------------------
# q123: OHLC bars — the hypertable/time-series rollup shape.
# --------------------------------------------------------------------------

_BUCKET_MS = 5 * 60 * 1000

_Q123_ORACLE = f"""
WITH ordered AS (
  SELECT event_type,
         CAST(FLOOR(epoch_ms(ts) / {_BUCKET_MS}) AS BIGINT) * {_BUCKET_MS} AS bucket_ms,
         value, ts, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, CAST(FLOOR(epoch_ms(ts) / {_BUCKET_MS}) AS BIGINT)
           ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, CAST(FLOOR(epoch_ms(ts) / {_BUCKET_MS}) AS BIGINT)
           ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, bucket_ms,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open_value,
       MAX(value) AS high_value,
       MIN(value) AS low_value,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close_value,
       {O_DSUM('value')} AS sum_value,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM ordered
GROUP BY event_type, bucket_ms
"""


@query("q123_ohlc_bars", oracle=_Q123_ORACLE, tags=("events", "window", "agg", "EXT"))
def q123_ohlc_bars(spark, sf_dir):
    """5-minute OHLC bars per event type — the hypertable rollup: open/
    close are the first/last value in the bucket (ties broken by
    event_id, so the answer is deterministic in both engines), high/low
    are plain min/max, and the volume sum is decimal-exact.

    Scale: the ranking window partitions by (event_type, bucket) —
    thousands of small partitions, never a global sort; the final agg
    reuses the same grouping key, so Catalyst plans ONE shuffle for
    window + agg. At 100 TB this is the shape continuous aggregates
    compact into per-bucket partials.
    """
    e = load(spark, sf_dir, "events")
    bucketed = e.select(
        "event_type",
        (F.floor(F.unix_millis("ts") / _BUCKET_MS).cast("long") * _BUCKET_MS).alias(
            "bucket_ms"
        ),
        "value",
        "ts",
        "event_id",
    )
    w_asc = Window.partitionBy("event_type", "bucket_ms").orderBy("ts", "event_id")
    w_desc = Window.partitionBy("event_type", "bucket_ms").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = bucketed.select(
        "event_type",
        "bucket_ms",
        "value",
        F.row_number().over(w_asc).alias("rn_a"),
        F.row_number().over(w_desc).alias("rn_d"),
    )
    return ranked.groupBy("event_type", "bucket_ms").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open_value"),
        F.max("value").alias("high_value"),
        F.min("value").alias("low_value"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close_value"),
        dsum("value").alias("sum_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# q124: dedup keep-best — clusters -> one kept document per cluster.
# --------------------------------------------------------------------------

# Reuse q23's exact n-gram Jaccard edge set (text.py) and q60's
# reachability closure as the cluster oracle, then pick each cluster's
# longest doc (ties -> lowest doc_id). Singleton docs keep themselves.
from .text import _Q23_ORACLE  # noqa: E402

_Q124_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_Q23_ORACLE})
),
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
cl AS (
  SELECT a AS doc_id, LEAST(MIN(b), a) AS cluster_id FROM reach GROUP BY a
),
assigned AS (
  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS cluster_id, d.n_chars
  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rn
  FROM assigned
)
SELECT r.cluster_id, r.doc_id AS kept_doc_id, r.n_chars AS kept_n_chars,
       m.n_members
FROM ranked r
JOIN (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
      FROM assigned GROUP BY cluster_id) m USING (cluster_id)
WHERE r.rn = 1
"""


@query("q124_dedup_keep_best", oracle=_Q124_ORACLE, tags=("dedup", "graph", "EXT"))
def q124_dedup_keep_best(spark, sf_dir):
    """The dedup DECISION step end-to-end: near-dup edges → connected
    components → keep one document per cluster (longest text, ties to
    the lowest doc_id), singletons keep themselves. This is the query a
    training-data pipeline actually materializes — the survivor list.

    Scale: edges come from the staged LSH path (text.py
    staged_near_dup_edges: MinHash → banding → exact verify on
    candidates only — linear in true dups, not in shared-shingle
    pairs; q108 proves it oracle-identical to the all-pairs join),
    components use large/small-star contraction (O(log²n) rounds,
    diameter-independent — see operators/graph.py), and the survivor
    pick is a per-cluster window over clusters that are by
    construction small. The cluster map (only docs that HAVE a dup)
    is smaller than the corpus by the dup rate — but that argument is
    ENFORCED, not assumed: gated_broadcast (operators/skew.py) counts
    the map (bounded probe) and broadcasts only under the row gate; a
    majority-duplicate corpus falls back to a shuffled hash join on
    doc_id instead of a driver-killing broadcast.
    """
    from ..operators.skew import gated_broadcast
    from .text import staged_near_dup_edges

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    edges = staged_near_dup_edges(spark, sf_dir)
    cl = connected_components_star(edges, src="doc_a", dst="doc_b").select(
        F.col("id").alias("doc_id"), "cluster_id"
    )
    assigned = docs.join(gated_broadcast(cl), "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        "n_chars",
    )
    # Rank and member count share one cluster_id window partitioning —
    # a single exchange+sort over one pass of assigned, replacing the
    # groupBy-count + join that re-derived and re-shuffled it.
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    wc = Window.partitionBy("cluster_id")
    return (
        assigned.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("kept_doc_id"),
            F.col("n_chars").alias("kept_n_chars"),
            "n_members",
        )
    )


# --------------------------------------------------------------------------
# q125: ordered conversion pattern (view -> purchase, no error between).
# --------------------------------------------------------------------------

_HORIZON_MS = 30 * 60 * 1000

_Q125_ORACLE = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, event_type,
         MAX(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ms,
         MAX(CASE WHEN event_type = 'error' THEN epoch_ms(ts) END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_error_ms
  FROM events
)
SELECT user_id, event_id AS purchase_id,
       epoch_ms(ts) AS purchase_ms, last_view_ms
FROM marked
WHERE event_type = 'purchase'
  AND last_view_ms IS NOT NULL
  AND epoch_ms(ts) - last_view_ms <= {_HORIZON_MS}
  AND (last_error_ms IS NULL OR last_error_ms < last_view_ms)
"""


@query("q125_conversion_pattern", oracle=_Q125_ORACLE, tags=("events", "window", "EXT"))
def q125_conversion_pattern(spark, sf_dir):
    """Sequence-pattern detection without MATCH_RECOGNIZE: purchases
    attributed to a prior view within 30 minutes with no intervening
    error — expressed as two running (conditional-max) windows over the
    per-user event stream, then a filter. One shuffle on user_id, one
    per-user sort; no self-join, no explode of candidate pairs.

    The streaming twin is attribution_join (streaming/ops.py T7); this
    is the batch/backfill path with the extra "no error between"
    sequencing predicate interval joins can't express.
    """
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ms = F.unix_millis("ts")
    marked = e.select(
        "user_id",
        "event_id",
        "event_type",
        ms.alias("ms"),
        F.max(F.when(F.col("event_type") == "view", ms)).over(w).alias("last_view_ms"),
        F.max(F.when(F.col("event_type") == "error", ms))
        .over(w)
        .alias("last_error_ms"),
    )
    return marked.filter(
        (F.col("event_type") == "purchase")
        & F.col("last_view_ms").isNotNull()
        & (F.col("ms") - F.col("last_view_ms") <= _HORIZON_MS)
        & (F.col("last_error_ms").isNull() | (F.col("last_error_ms") < F.col("last_view_ms")))
    ).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ms").alias("purchase_ms"),
        "last_view_ms",
    )


# --------------------------------------------------------------------------
# q227: per-source dedup report card — the dashboard a data team reads
# after the dedup pass: how much of each source survives keep-best,
# how much text mass the survivors carry. Clusters are attributed to
# the KEPT doc's source (a cross-source cluster counts for whoever won
# it — documented, and exactly what the oracle computes too).
# --------------------------------------------------------------------------

_Q227_ORACLE = f"""
WITH RECURSIVE surv AS ({_Q124_ORACLE}),
per_src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
  FROM documents GROUP BY source
),
kept AS (
  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept,
         CAST(SUM(s.kept_n_chars) AS BIGINT) AS n_chars_kept,
         CAST(SUM(s.n_members) AS BIGINT) AS n_members_repr
  FROM surv s JOIN documents d ON s.kept_doc_id = d.doc_id
  GROUP BY d.source
)
SELECT p.source, p.n_docs,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       1.0 - COALESCE(k.n_kept, 0) / CAST(p.n_docs AS DOUBLE) AS dedup_rate,
       p.n_chars_total,
       CAST(COALESCE(k.n_chars_kept, 0) AS BIGINT) AS n_chars_kept,
       CAST(COALESCE(k.n_members_repr, 0) AS BIGINT) AS n_members_repr
FROM per_src p LEFT JOIN kept k ON p.source = k.source
"""


@query("q227_dedup_report_card", oracle=_Q227_ORACLE, tags=("dedup", "pipeline", "EXT"))
def q227_dedup_report_card(spark, sf_dir):
    """Per-source survivor stats over the q124 keep-best decision: doc
    and char counts before/after, the dedup rate, and how many corpus
    members the source's survivors represent. One broadcast-sized join
    (survivors are dup-bounded) + two map-side-combinable aggregates
    on top of the already-verified dedup pipeline — the marginal cost
    of the report is the report.

    LEFT join + COALESCE (round-9 ADVICE): a source whose every doc
    loses its cluster to another source's keeper must show
    n_kept=0 / dedup_rate=1.0 — the most interesting row for a dedup
    dashboard — not silently vanish from the report."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    surv = q124_dedup_keep_best(spark, sf_dir)
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars_total"),
    )
    kept = (
        surv.join(
            docs.select(F.col("doc_id").alias("kept_doc_id"), "source"),
            "kept_doc_id",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("kept_n_chars").cast("long").alias("n_chars_kept"),
            F.sum("n_members").cast("long").alias("n_members_repr"),
        )
    )
    n_kept = F.coalesce("n_kept", F.lit(0)).cast("long")
    return per_src.join(kept, "source", "left").select(
        "source",
        "n_docs",
        n_kept.alias("n_kept"),
        (F.lit(1.0) - n_kept / F.col("n_docs").cast("double")).alias(
            "dedup_rate"
        ),
        "n_chars_total",
        F.coalesce("n_chars_kept", F.lit(0)).cast("long").alias("n_chars_kept"),
        F.coalesce("n_members_repr", F.lit(0)).cast("long").alias("n_members_repr"),
    )
