"""ETL/CDC extensions: SCD2 change application (the history-keeping
form of the reference's overwrite-upsert, `/root/reference/
gule_test_job.py:124-156` + `:200-211`) and Gopher-style repetition
quality signals for training-data curation (SURVEY §2 EXT text
analysis).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load
from ..operators.cdc import scd2_apply
from .registry import query

# --------------------------------------------------------------------------
# SCD2 upsert: apply a derived change batch to the customer dimension.
# --------------------------------------------------------------------------

_Q100_ORACLE = """
WITH changes AS (
  SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 10 = 0
)
SELECT c_custkey, c_acctbal, c_mktsegment, version, is_current FROM (
  SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment,
         'base' AS version, TRUE AS is_current
  FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM changes ch WHERE ch.c_custkey = c.c_custkey)
  UNION ALL
  SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment,
         'closed' AS version, FALSE AS is_current
  FROM customer c
  WHERE EXISTS (SELECT 1 FROM changes ch WHERE ch.c_custkey = c.c_custkey)
  UNION ALL
  SELECT ch.c_custkey, ch.c_acctbal, ch.c_mktsegment,
         'updated' AS version, TRUE AS is_current
  FROM changes ch
) t
"""


@query("q100_scd2_upsert", oracle=_Q100_ORACLE, tags=("merge", "cdc", "EXT"))
def q100_scd2_upsert(spark, sf_dir):
    """SCD type-2 change application on the customer dimension: a
    deterministic change batch (every 10th customer gets +100 balance)
    produces closed-out prior versions plus new current versions, with
    untouched customers passing through. One broadcast left join
    classifies every snapshot row (inserts come straight from the
    change batch); the snapshot never shuffles."""
    c = load(spark, sf_dir, "customer")
    changes = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        "c_mktsegment",
    )
    return scd2_apply(
        c.select("c_custkey", "c_acctbal", "c_mktsegment"),
        changes,
        key="c_custkey",
        tracked=["c_acctbal", "c_mktsegment"],
    )


# --------------------------------------------------------------------------
# Gopher-style repetition signals: top-token share + unique-token ratio.
# --------------------------------------------------------------------------

_Q101_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
agg AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_toks,
         CAST(COUNT(*) AS BIGINT) AS n_unique,
         CAST(MAX(c) AS BIGINT) AS top_cnt
  FROM cnt GROUP BY doc_id
)
SELECT doc_id, n_toks, n_unique, top_cnt,
       CAST(top_cnt AS DOUBLE) / n_toks AS top_share,
       CAST(n_unique AS DOUBLE) / n_toks AS unique_ratio
FROM agg
"""


@query("q101_repetition_signals", oracle=_Q101_ORACLE, tags=("text", "agg", "EXT"))
def q101_repetition_signals(spark, sf_dir):
    """Repetition-based quality signals (Gopher rules): most-frequent-
    token share and unique-token ratio per document. Two hash
    aggregations over the exploded token table; both shuffles key on
    doc_id(+tok), so the plan scales linearly with corpus size — no
    per-document Python."""
    d = load(spark, sf_dir, "documents")
    cnt = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_toks"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.max("c").cast("long").alias("top_cnt"),
    )
    return agg.select(
        "doc_id",
        "n_toks",
        "n_unique",
        "top_cnt",
        (F.col("top_cnt").cast("double") / F.col("n_toks")).alias("top_share"),
        (F.col("n_unique").cast("double") / F.col("n_toks")).alias("unique_ratio"),
    )


# --------------------------------------------------------------------------
# Z-order layout keys (exact-verified bit interleave).
# --------------------------------------------------------------------------

_Z_BITS = 16
_Z_TERMS = " | ".join(
    f"((((l_partkey >> {i}) & 1) << {2 * i}) | "
    f"(((l_suppkey >> {i}) & 1) << {2 * i + 1}))"
    for i in range(_Z_BITS)
)
_Q106_ORACLE = f"""
SELECT l_orderkey, l_linenumber, CAST({_Z_TERMS} AS BIGINT) AS zkey
FROM lineitem
"""


@query("q106_zorder_key", oracle=_Q106_ORACLE, tags=("layout", "EXT"))
def q106_zorder_key(spark, sf_dir):
    """Z-order (Morton) clustering key over (l_partkey, l_suppkey):
    the layout step behind multi-dimensional file pruning — range-
    partitioning + sorting by this key before a parquet write gives
    row-group min/max locality on BOTH columns. Pure built-in bit
    arithmetic (shiftleft/shiftright/AND/OR), fully inside codegen; the
    oracle replays the identical interleave in SQL, so the key is
    exact-verified bit for bit."""
    from ..operators.layout import zorder_by

    l = load(spark, sf_dir, "lineitem")
    return zorder_by(l, "l_partkey", "l_suppkey", bits=_Z_BITS).select(
        "l_orderkey", "l_linenumber", "zkey"
    )


# --------------------------------------------------------------------------
# Count-min sketch heavy hitters — a mergeable frequency sketch built
# from nothing but groupBy/min, verified in-band against exact counts.
# --------------------------------------------------------------------------

_CMS_SEEDS = 4
_CMS_WIDTH = 1024
_CMS_TOPK = 20

_Q109_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM toks GROUP BY tok)
SELECT tok, exact_cnt, TRUE AS cms_ok
FROM cnt
ORDER BY exact_cnt DESC, tok
LIMIT {_CMS_TOPK}
"""


@query("q109_countmin_heavy_hitters", oracle=_Q109_ORACLE, tags=("text", "agg", "sketch", "EXT"))
def q109_countmin_heavy_hitters(spark, sf_dir):
    """Count-min sketch over the token stream, as pure DataFrame ops:
    each token occurrence increments d=4 x w=1024 counters
    (groupBy(seed, bucket) — the counter matrix is w*d rows TOTAL,
    independent of corpus size, and merges across partitions/days by
    summing). Heavy-hitter estimates = min over seeds of the joined
    counters. CMS guarantees est >= exact; the in-band check also
    bounds the overestimate by 8*N/w (Markov bound across 4
    independent seeds), so the oracle pins exact top-k counts and the
    sketch must agree within theory."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    seeds = spark.range(_CMS_SEEDS).select(F.col("id").cast("int").alias("seed"))
    keyed = toks.crossJoin(F.broadcast(seeds)).select(
        "tok", "seed", F.pmod(F.xxhash64("tok", "seed"), F.lit(_CMS_WIDTH)).alias("bkt")
    )
    counters = keyed.groupBy("seed", "bkt").agg(F.count(F.lit(1)).alias("c"))

    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), F.asc("tok")).limit(_CMS_TOPK)
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))

    est = (
        top.crossJoin(F.broadcast(seeds))
        .select(
            "tok",
            "exact_cnt",
            "seed",
            F.pmod(F.xxhash64("tok", "seed"), F.lit(_CMS_WIDTH)).alias("bkt"),
        )
        .join(F.broadcast(counters), ["seed", "bkt"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("c").alias("est"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            "tok",
            F.col("exact_cnt").cast("long").alias("exact_cnt"),
            (
                (F.col("est") >= F.col("exact_cnt"))
                & (
                    F.col("est")
                    <= F.col("exact_cnt") + 8.0 * F.col("n_total") / F.lit(_CMS_WIDTH)
                )
            ).alias("cms_ok"),
        )
    )
