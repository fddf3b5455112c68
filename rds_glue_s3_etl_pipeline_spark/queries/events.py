"""Temporal / event-stream queries (batch surface): lag-lead analytics
W2, as-of join J6, JSON extraction (§2.8 map/JSON family), tumbling
windows (batch analog of streaming T1), and sessionization.

Timestamps are emitted as epoch-millis BIGINTs (``unix_millis`` /
``epoch_ms``) so Spark and DuckDB hash identically.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.asof import asof_join
from .registry import O_DSUM, dsum, query

# --------------------------------------------------------------------------
# W2: lag / lead analytics.
# --------------------------------------------------------------------------

_Q11_ORACLE = """
SELECT event_id, user_id, event_type,
       epoch_ms(ts) AS ts_ms,
       epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) AS gap_ms,
       LEAD(event_type) OVER w AS next_type,
       FIRST_VALUE(event_type) OVER w AS first_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("q11_lag_lead", oracle=_Q11_ORACLE, tags=("window", "W2", "events"))
def q11_lag_lead(spark, sf_dir):
    """Per-user lag/lead/first analytics (SURVEY §2.5 W2)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("ts_ms"),
        (F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))).alias("gap_ms"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_type").over(wf).alias("first_type"),
    )


# --------------------------------------------------------------------------
# J6: as-of join — each click joins the latest prior purchase's value.
# --------------------------------------------------------------------------

_Q15_ORACLE = """
WITH tagged AS (
  SELECT user_id, ts, event_id, NULL AS pval, 0 AS side
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, event_id, value AS pval, 1 AS side
  FROM events WHERE event_type = 'purchase'
),
filled AS (
  SELECT user_id, ts, event_id, side,
         LAST_VALUE(pval IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY ts, side DESC, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS asof_value
  FROM tagged
)
SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, asof_value
FROM filled WHERE side = 0
"""


@query("q15_asof_join", oracle=_Q15_ORACLE, tags=("join", "J6", "events"))
def q15_asof_join(spark, sf_dir):
    """As-of join (SURVEY §2.3 J6) via the union-sort trick: one
    shuffle+sort on user_id instead of a per-key nested loop — linear
    at 100 TB where a non-equi range join would be quadratic."""
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks, purchases, on="user_id", ts="ts", value_cols=["value"], tie_col="event_id"
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.col("asof_value"),
    )


# --------------------------------------------------------------------------
# §2.8 map/JSON family: parse events.props.
# --------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


@query("q16_json_extract", oracle=_Q16_ORACLE, tags=("scalar", "json", "events"))
def q16_json_extract(spark, sf_dir):
    """JSON path extraction over the props column (SURVEY §2.8
    map/JSON; mirrors the reference's JSON-records ingest S1)."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
        F.max(k).alias("max_k"),
    )


# --------------------------------------------------------------------------
# T1 (batch analog): tumbling window aggregation.
# --------------------------------------------------------------------------

_Q17_ORACLE = f"""
SELECT epoch_ms(date_trunc('hour', ts)) AS window_ms,
       event_type,
       COUNT(*) AS n,
       {O_DSUM("value")} AS sum_value
FROM events
GROUP BY 1, 2
"""


@query("q17_tumbling_window", oracle=_Q17_ORACLE, tags=("window", "T1", "events"))
def q17_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour window aggregate via F.window — the exact same
    expression Structured Streaming runs incrementally (SURVEY §2.9
    T1); epoch-aligned so DuckDB's date_trunc is its oracle."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_ms"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# Sessionization (gap-based), the batch analog of T2 session windows.
# --------------------------------------------------------------------------

_Q18_ORACLE = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > 1800000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM g GROUP BY user_id
"""


@query("q18_sessionize", oracle=_Q18_ORACLE, tags=("window", "T2", "events"))
def q18_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min gap): lag + flag + sum — one
    shuffle on user_id shared by the window and the final aggregate."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
    new_session = F.when(gap_ms.isNull() | (gap_ms > 1800000), 1).otherwise(0)
    return (
        e.select("user_id", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --------------------------------------------------------------------------
# Sequenced funnel: view -> click -> purchase with strictly increasing
# timestamps (each stage's earliest occurrence AFTER the prior stage).
# --------------------------------------------------------------------------

_Q82_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT v.user_id,
       epoch_ms(v.t_view) AS view_ms,
       epoch_ms(c.t_click) AS click_ms,
       epoch_ms(p.t_purchase) AS purchase_ms,
       CAST(1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT
            AS INT) AS funnel_depth
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
"""


@query("q82_user_funnel", oracle=_Q82_ORACLE, tags=("events", "join", "agg", "EXT"))
def q82_user_funnel(spark, sf_dir):
    """Ordered conversion funnel: per user, earliest view, earliest
    click after that view, earliest purchase after that click. Three
    aggregates all keyed on user_id — one shuffle partitioning reused
    across every stage (Exchange reuse), stage frames shrink
    monotonically."""
    e = load(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.unix_millis("t_view").alias("view_ms"),
            F.unix_millis("t_click").alias("click_ms"),
            F.unix_millis("t_purchase").alias("purchase_ms"),
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            ).alias("funnel_depth"),
        )
    )
