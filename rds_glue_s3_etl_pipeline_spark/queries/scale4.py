"""Third scale-pattern batch: training-sequence packing, incremental
corpus dedup, and portable-hash similarity (oracle-verifiable LSH).

Reference parity note: none of these exist in the reference
(`/root/reference/gule_test_job.py` is a single merge job); they are
north-star EXT surface (SURVEY §2) for the LLM-data pipeline, each
oracle-verified.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load
from ..functions import text as X
from ..operators.prefix import global_running_sum
from .registry import query

# --------------------------------------------------------------------------
# q122: training-sequence packing (concat-and-chunk). Pretraining
# pipelines concatenate documents in a fixed order and slice the token
# stream into fixed-size sequences; a document can span a block
# boundary. Per block we report how many documents touch it, how many
# start in it, and its token fill. The global token offsets come from
# the two-pass distributed prefix operator (operators/prefix.py) — one
# range shuffle + a kilobyte-sized partials job — NOT an unpartitioned
# window, so the same plan holds on a 100 TB token stream. The
# per-document block-span explode emits ceil(toks/B) rows per doc
# (bounded by document length), and the final per-block rollup is one
# hash aggregation.
# --------------------------------------------------------------------------

_SEQ_LEN = 512  # tokens per packed training sequence

_Q122_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         CAST(array_length(regexp_split_to_array(TRIM(text), '\\s+')) AS BIGINT)
           AS toks
  FROM documents
), o AS (
  SELECT doc_id, toks,
         SUM(toks) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run
  FROM t WHERE toks > 0
), s AS (
  SELECT doc_id, toks, run - toks AS start_off, run AS end_off,
         CAST(floor((run - toks) / {_SEQ_LEN}.0) AS BIGINT) AS fb,
         CAST(floor((run - 1) / {_SEQ_LEN}.0) AS BIGINT) AS lb
  FROM o
), b AS (
  SELECT fb, start_off, end_off,
         UNNEST(generate_series(fb, lb)) AS seq_id
  FROM s
)
SELECT seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN fb = seq_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_starts,
       CAST(SUM(LEAST(end_off, (seq_id + 1) * {_SEQ_LEN})
                - GREATEST(start_off, seq_id * {_SEQ_LEN})) AS BIGINT)
         AS fill_tokens
FROM b
GROUP BY seq_id
"""


@query("q122_sequence_packing", oracle=_Q122_ORACLE, tags=("text", "scale", "EXT"))
def q122_sequence_packing(spark, sf_dir):
    """Pack the document token stream into fixed-length training
    sequences: global token offsets via the distributed two-pass
    prefix sum, block spans via a bounded sequence() explode, then one
    per-block aggregation."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("toks"),
    ).filter(F.col("toks") > 0)
    o = global_running_sum(t, ["doc_id"], "toks", out_col="run")
    s = o.select(
        "doc_id",
        "toks",
        (F.col("run") - F.col("toks")).alias("start_off"),
        F.col("run").alias("end_off"),
        F.floor((F.col("run") - F.col("toks")) / F.lit(float(_SEQ_LEN)))
        .cast("long")
        .alias("fb"),
        F.floor((F.col("run") - 1) / F.lit(float(_SEQ_LEN)))
        .cast("long")
        .alias("lb"),
    )
    b = s.select(
        "fb",
        "start_off",
        "end_off",
        F.explode(F.sequence("fb", "lb")).alias("seq_id"),
    )
    blk_lo = F.col("seq_id") * _SEQ_LEN
    blk_hi = (F.col("seq_id") + 1) * _SEQ_LEN
    return b.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("fb") == F.col("seq_id"), 1).otherwise(0))
        .cast("long")
        .alias("n_starts"),
        F.sum(
            F.least(F.col("end_off"), blk_hi)
            - F.greatest(F.col("start_off"), blk_lo)
        )
        .cast("long")
        .alias("fill_tokens"),
    )
