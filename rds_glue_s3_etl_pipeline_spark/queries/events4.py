"""Fourth events batch — turning the event log into TRAINING DATA:
per-session transcript documents (the chat-log → SFT-corpus assembly
shape, q177) and the event-type transition matrix (behavioral Markov
model, q178).

Both reuse q18's session semantics (30-min gap, (ts, event_id) total
order) so every query over sessions agrees on the boundaries.

Reference parity: the reference pipeline has no event-log processing —
EXT operators from the LLM-pipeline north star (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load
from .registry import query

# Formatting contract for transcript lines: value is re-quantized to
# DECIMAL(12,2) before rendering — the fixture carries 2dp values, and
# decimal→string is identical across engines where double→string is
# not (shortest-roundtrip renderings differ).
_LINE_SQL = "event_type || '=' || CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR)"

_Q177_ORACLE = f"""
WITH g AS (
  SELECT user_id, ts, event_id, event_type, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > 1800000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
),
lines AS (
  SELECT user_id, session_id, ts, event_id, ({_LINE_SQL}) AS line FROM s
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(epoch_ms(MIN(ts)) AS BIGINT) AS start_ms,
       CAST(epoch_ms(MAX(ts)) AS BIGINT) AS end_ms,
       md5(string_agg(line, chr(10) ORDER BY ts, event_id)) AS transcript_fp,
       CAST(SUM(LENGTH(line)) + COUNT(*) - 1 AS BIGINT) AS n_chars
FROM lines GROUP BY user_id, session_id
"""


@query("q177_session_transcript", oracle=_Q177_ORACLE, tags=("events", "pipeline", "EXT"))
def q177_session_transcript(spark, sf_dir):
    """Assemble each session into one ordered transcript document
    ('type=value' lines, newline-joined) and fingerprint it — the
    event-log → training-document conversion. One shuffle on user_id
    serves the session window AND the per-session aggregate; the
    transcript rebuild is array_sort(collect_list(struct(...))) per
    session, so per-task state is one session, never one user's
    history (sessions are gap-bounded). The fp proves the assembled
    TEXT matches, not just the counts."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
    new_session = F.when(gap_ms.isNull() | (gap_ms > 1800000), 1).otherwise(0)
    line = F.concat(
        F.col("event_type"),
        F.lit("="),
        F.col("value").cast("decimal(12,2)").cast("string"),
    )
    s = e.select(
        "user_id",
        "ts",
        "event_id",
        new_session.alias("new_session"),
        line.alias("line"),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_millis(F.min("ts")).alias("start_ms"),
        F.unix_millis(F.max("ts")).alias("end_ms"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "line"))),
                    lambda st: st["line"],
                ),
                "\n",
            ).cast("binary")
        ).alias("transcript_fp"),
        (F.sum(F.length("line")) + F.count(F.lit(1)) - 1)
        .cast("long")
        .alias("n_chars"),
    )


_Q178_ORACLE = """
WITH seq AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
c AS (
  SELECT cur, nxt, COUNT(*) AS n FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
),
tot AS (SELECT cur, SUM(n) AS t FROM c GROUP BY cur)
SELECT c.cur, c.nxt, CAST(c.n AS BIGINT) AS n_transitions,
       c.n / CAST(tot.t AS DOUBLE) AS p
FROM c JOIN tot USING (cur)
"""


@query("q178_event_markov", oracle=_Q178_ORACLE, tags=("events", "agg", "EXT"))
def q178_event_markov(spark, sf_dir):
    """First-order Markov transition matrix over event types within
    each user's (ts, event_id)-ordered stream: counts and exact-ratio
    probabilities. The lead() window shuffles once on user_id; the
    transition aggregate is |types|² rows at any scale."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    c = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n_transitions"))
    tot = c.groupBy("cur").agg(F.sum("n_transitions").alias("t"))
    return c.join(F.broadcast(tot), "cur").select(
        "cur",
        "nxt",
        "n_transitions",
        (F.col("n_transitions") / F.col("t").cast("double")).alias("p"),
    )
