"""Driver-checkable queries for the job-level surfaces that were
pytest-only until round 6: the token-balanced shard sink (S9) and the
config-driven job entry (S10). Each query RUNS the real sink/pipeline
against a scratch directory, reads the materialized output back, and
returns a DataFrame the DuckDB oracle can hash-verify — putting the
end-to-end write path under the driver's eye, not just unit tests.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..catalog import load
from ..scratch import scratch_dir
from .registry import query

_SHARD_TARGET = 50_000  # chars per shard; ~15 shards at sf0.01

# write_token_balanced_shards assigns shard = floor(exclusive-prefix
# weight / target) in doc_id order — exactly expressible as a window.
_Q130_ORACLE = f"""
WITH cum AS (
  SELECT doc_id, n_chars,
         COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM documents
)
SELECT CAST(FLOOR(prior / {_SHARD_TARGET}.0) AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM cum
GROUP BY CAST(FLOOR(prior / {_SHARD_TARGET}.0) AS BIGINT)
"""


@query("q130_token_shards", oracle=_Q130_ORACLE, tags=("sink", "EXT"))
def q130_token_shards(spark, sf_dir):
    """S9 end-to-end under the oracle: run the token-balanced shard
    sink (two-pass prefix-sum assignment, docs never split — see
    sources/sinks.py) over the documents table, read the sharded
    parquet back, and report per-shard stats. Hash-verified against a
    window-function recompute of the exact shard assignment."""
    from ..sources.sinks import write_token_balanced_shards

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = scratch_dir("q130_shards_")
    write_token_balanced_shards(
        d, out, weight_col="n_chars", order_cols=["doc_id"],
        target_weight_per_shard=_SHARD_TARGET,
    )
    back = spark.read.parquet(out)
    return back.groupBy(F.col("shard").cast("long").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


_Q131_ORACLE = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


@query("q131_config_job", oracle=_Q131_ORACLE, tags=("pipeline", "EXT"))
def q131_config_job(spark, sf_dir):
    """S10 end-to-end under the oracle: drive the reference dataflow
    (validate → precedence-merge → audit → single-CSV sink → notify,
    gule_test_job.py:107-221) from a JSON-shaped config dict through
    job_config.run_job, then read the CSV artifact back with the
    table's schema. Primary and fallback are both the nation table, so
    the merged output must equal it exactly — any column reorder, cell
    corruption, or CSV round-trip drift breaks the hash. nation is
    all-exact types (no CSV float formatting ambiguity)."""
    from ..job_config import run_job

    out_dir = scratch_dir("q131_job_")
    out_csv = os.path.join(out_dir, "merged.csv")
    nation_path = os.path.join(sf_dir, "nation.parquet")
    run_job(
        spark,
        {
            "primary": {"format": "parquet", "path": nation_path},
            "fallback": {"format": "parquet", "path": nation_path},
            "merge": {"key": "n_nationkey"},
            "output": {"path": out_csv},
        },
    )
    schema = load(spark, sf_dir, "nation").schema
    return spark.read.option("header", True).schema(schema).csv(out_csv)


# --------------------------------------------------------------------------
# q133: the flagship composite — a pretraining-corpus export in one
# query: quality gate -> near-dup survivor pick -> token-balanced
# shard assignment. This is the materialization a training-data
# pipeline actually ships to the trainer, and every stage is the
# oracle-verified operator it reuses (q20 quality, q124 survivors,
# q130 shard math).
# --------------------------------------------------------------------------

_QUALITY_MIN = 0.5
_EXPORT_TARGET = 50_000


def _q133_oracle() -> str:
    from .events3 import _Q124_ORACLE
    from .text import _SW_SQL

    quality = (
        "0.5 * (LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / LENGTH(text))"
        f" + 0.3 * LEAST((({_SW_SQL}) /"
        " array_length(regexp_split_to_array(TRIM(text), '\\s+'))) * 5, 1.0)"
        " + 0.2 * (CASE WHEN LENGTH(text) >= 100 AND LENGTH(text) <= 20000"
        " THEN 1.0 ELSE 0.0 END)"
    )
    return f"""
WITH kept AS (
  SELECT kept_doc_id FROM ({_Q124_ORACLE})
),
export AS (
  SELECT d.doc_id, d.n_chars, ({quality}) AS quality
  FROM documents d JOIN kept ON kept.kept_doc_id = d.doc_id
  WHERE ({quality}) >= {_QUALITY_MIN}
),
cum AS (
  SELECT doc_id, n_chars, quality,
         COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM export
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, quality,
       CAST(FLOOR(prior / {_EXPORT_TARGET}.0) AS BIGINT) AS shard
FROM cum
"""


@query("q133_pretrain_export", oracle=_q133_oracle(), tags=("pipeline", "dedup", "EXT"))
def q133_pretrain_export(spark, sf_dir):
    """End-to-end training-corpus build: near-dup SURVIVORS (staged-LSH
    edges → star-contraction clusters → longest-doc pick, q124) pass a
    QUALITY gate (q20's weighted heuristic) and receive token-balanced
    SHARD ids (two-pass prefix sum, q130's math) — one DataFrame, every
    stage the already-oracle-verified operator it reuses.

    Scale: the three stages compose without a driver round-trip; the
    only orderings are the per-cluster survivor window (bounded
    clusters) and the range-partitioned prefix sum (operators/
    prefix.py) for shard ids. At 100 TB this query IS the export job;
    writing it is write_token_balanced_shards on the result. Survivors
    come from the MATERIALIZED corpus snapshot (queries/corpus.py:
    corpus_survivor_snapshot — built once per corpus via the
    epoch-partitioned idempotent sink, shared with q134, refreshed
    incrementally by the q159 path) rather than a per-query recompute.
    """
    from ..functions import text as X
    from ..operators.prefix import global_running_sum
    from .corpus import corpus_survivor_snapshot

    kept = corpus_survivor_snapshot(spark, sf_dir).select(
        F.col("kept_doc_id").alias("doc_id")
    )
    d = load(spark, sf_dir, "documents").join(kept, "doc_id")
    export = d.select(
        "doc_id", "n_chars", X.quality_score("text").alias("quality")
    ).filter(F.col("quality") >= _QUALITY_MIN)
    cum = global_running_sum(export, ["doc_id"], value="n_chars", out_col="__cum")
    return cum.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        "quality",
        F.floor((F.col("__cum") - F.col("n_chars")) / F.lit(float(_EXPORT_TARGET)))
        .cast("long")
        .alias("shard"),
    )


# --------------------------------------------------------------------------
# q134: corpus-mix report — per-source share of documents and chars,
# before dedup and after the survivor pick. The go/no-go report a data
# team reads before training: a source whose share COLLAPSES after
# dedup was mostly duplicates (scraper echo, mirror site).
# --------------------------------------------------------------------------


def _q134_oracle() -> str:
    from .events3 import _Q124_ORACLE

    return f"""
WITH kept AS (
  SELECT kept_doc_id FROM ({_Q124_ORACLE})
),
pre AS (
  SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS chars
  FROM documents GROUP BY source
),
post AS (
  SELECT d.source, COUNT(*) AS n_docs, SUM(d.n_chars) AS chars
  FROM documents d JOIN kept ON kept.kept_doc_id = d.doc_id
  GROUP BY d.source
)
SELECT pre.source,
       CAST(pre.n_docs AS BIGINT) AS docs_pre,
       CAST(COALESCE(post.n_docs, 0) AS BIGINT) AS docs_post,
       CAST(pre.chars AS BIGINT) AS chars_pre,
       CAST(COALESCE(post.chars, 0) AS BIGINT) AS chars_post,
       COALESCE(post.chars, 0) / CAST(pre.chars AS DOUBLE) AS survival_rate
FROM pre LEFT JOIN post ON pre.source = post.source
"""


@query("q134_corpus_mix_report", oracle=_q134_oracle(), tags=("pipeline", "dedup", "EXT"))
def q134_corpus_mix_report(spark, sf_dir):
    """Per-source mix before/after the dedup survivor pick: doc and
    char counts plus the char survival rate. Both aggregates are
    map-side combinable groupBys. The survivor set is ~corpus-sized
    (every non-duplicate keeps itself), so it hash-joins on doc_id —
    NOT a broadcast; only q124's internal cluster map (dup subset) is
    broadcast-sized. A collapsed survival_rate flags a source as
    duplicate-heavy before any tokens are spent on it. Survivors are
    READ from the materialized corpus snapshot (shared with q133 via
    corpus_survivor_snapshot) — one clustering pass serves every
    downstream composite."""
    from .corpus import corpus_survivor_snapshot

    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    pre = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_pre"),
        F.sum("n_chars").alias("chars_pre"),
    )
    kept = corpus_survivor_snapshot(spark, sf_dir).select(
        F.col("kept_doc_id").alias("doc_id")
    )
    post = (
        d.join(kept, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_post"),
            F.sum("n_chars").alias("chars_post"),
        )
    )
    return pre.join(post, "source", "left").select(
        "source",
        "docs_pre",
        F.coalesce("docs_post", F.lit(0)).alias("docs_post"),
        "chars_pre",
        F.coalesce("chars_post", F.lit(0)).alias("chars_post"),
        (
            F.coalesce("chars_post", F.lit(0)) / F.col("chars_pre").cast("double")
        ).alias("survival_rate"),
    )
