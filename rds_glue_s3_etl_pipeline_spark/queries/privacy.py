"""Privacy / anonymization batch: regex identifier redaction with
per-group accounting (q199) and keyed-hash pseudonymization with a
join-consistency gate (q201).

Before a corpus leaves a pipeline as training data, identifiers get
scrubbed (digit runs, account numbers) and stable join keys get
replaced by deterministic pseudonyms so cross-table structure
survives without exposing the raw key space. Both are single-pass,
shuffle-light column transforms — the redaction is map-only ahead of
one small aggregate, the pseudonym is a hash projection that keeps
joins co-partitionable (same pseudonym ⇔ same key, so a join on the
pseudonym shuffles exactly like a join on the key).

The synthetic fixture carries no real PII; the digit-run pattern
redacts the entity serials embedded in ``c_name``/``s_name``
("Customer#000000042"), which exercises the identical mechanism.

Reference scope: the reference job (gule_test_job.py) exports merged
rows as-is; this batch belongs to the beyond-reference training-data
families (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load
from .registry import query

# Digit runs of >= 6 — entity serials, account-number-shaped tokens.
_ID_PATTERN = "[0-9]{6,}"
_MASK = "[ID]"

_Q199_ORACLE = f"""
WITH profiles AS (
  SELECT 'customer:' || c_mktsegment AS grp, c_name AS profile
  FROM customer
  UNION ALL
  SELECT 'supplier' AS grp, s_name AS profile FROM supplier
),
red AS (
  SELECT grp,
         profile,
         regexp_replace(profile, '{_ID_PATTERN}', '{_MASK}', 'g') AS redacted,
         len(regexp_extract_all(profile, '{_ID_PATTERN}')) AS n_red,
         length(profile)
           - length(regexp_replace(profile, '{_ID_PATTERN}', '', 'g'))
           AS chars_gone
  FROM profiles
)
SELECT grp,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n_red) AS BIGINT) AS n_redactions,
       CAST(SUM(chars_gone) AS BIGINT) AS chars_removed,
       MIN(redacted) AS sample_redacted
FROM red
GROUP BY grp
"""


@query("q199_redact_identifiers", oracle=_Q199_ORACLE, tags=("text", "privacy", "EXT"))
def q199_redact_identifiers(spark, sf_dir):
    """Scrub digit-run identifiers from free-text profile columns and
    account for every removal: per group, how many redactions and how
    many characters left the corpus, plus the lexicographically first
    redacted value as a deterministic sample. Map-only regex work
    (JVM ``regexp_replace`` / ``regexp_extract_all``, no UDF) feeding
    a tiny aggregate — at 100 TB the scan dominates and nothing else
    shuffles. The redaction accounting matters as much as the scrub:
    a silent redactor is unauditable."""
    cust = load(spark, sf_dir, "customer").select(
        F.concat(F.lit("customer:"), F.col("c_mktsegment")).alias("grp"),
        F.col("c_name").alias("profile"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("grp"), F.col("s_name").alias("profile")
    )
    profiles = cust.unionByName(supp)
    red = profiles.select(
        "grp",
        F.regexp_replace("profile", _ID_PATTERN, _MASK).alias("redacted"),
        # idx=0 = whole-match list (Spark's default idx is group 1,
        # which errors on a group-less pattern; DuckDB defaults to 0)
        F.size(
            F.regexp_extract_all("profile", F.lit(_ID_PATTERN), F.lit(0))
        ).alias("n_red"),
        (
            F.length("profile")
            - F.length(F.regexp_replace("profile", _ID_PATTERN, ""))
        ).alias("chars_gone"),
    )
    return red.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_red").cast("long").alias("n_redactions"),
        F.sum("chars_gone").cast("long").alias("chars_removed"),
        F.min("redacted").alias("sample_redacted"),
    )


_Q201_ORACLE = """
WITH c AS (
  SELECT md5('cust:' || CAST(c_custkey AS VARCHAR)) AS pseud,
         c_custkey, c_mktsegment
  FROM customer
),
o AS (
  SELECT md5('cust:' || CAST(o_custkey AS VARCHAR)) AS pseud FROM orders
),
joined AS (
  SELECT c.c_mktsegment AS segment, COUNT(*) AS n_orders
  FROM o JOIN c ON c.pseud = o.pseud
  GROUP BY 1
),
gate AS (
  SELECT CASE WHEN COUNT(DISTINCT pseud) = COUNT(DISTINCT c_custkey)
              THEN 'ok' ELSE 'FAIL collision' END AS collision_gate
  FROM c
)
SELECT j.segment, CAST(j.n_orders AS BIGINT) AS n_orders,
       g.collision_gate
FROM joined j CROSS JOIN gate g
"""


@query("q201_pseudonymize_ids", oracle=_Q201_ORACLE, tags=("privacy", "join", "EXT"))
def q201_pseudonymize_ids(spark, sf_dir):
    """Keyed-hash pseudonymization of a stable join key: both sides of
    the customer/orders relationship map ``c_custkey`` through the
    same salted md5, and the per-segment order counts are computed
    ENTIRELY in pseudonym space — proving cross-table structure
    survives anonymization (the join on the pseudonym returns exactly
    the join on the raw key, which is what the oracle hash-checks).
    The collision gate pins the injectivity assumption the whole
    scheme rests on. Scale shape: a hash projection adds no shuffle;
    the pseudonym join partitions exactly like the raw-key join."""
    pseud = lambda c: F.md5(  # noqa: E731
        F.concat(F.lit("cust:"), F.col(c).cast("string")).cast("binary")
    )
    cust = load(spark, sf_dir, "customer").select(
        pseud("c_custkey").alias("pseud"),
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
    )
    ords = load(spark, sf_dir, "orders").select(pseud("o_custkey").alias("pseud"))
    joined = (
        ords.join(cust.select("pseud", "segment"), "pseud")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    gate = cust.agg(
        F.when(
            F.countDistinct("pseud") == F.countDistinct("c_custkey"), F.lit("ok")
        )
        .otherwise(F.lit("FAIL collision"))
        .alias("collision_gate")
    )
    return joined.crossJoin(F.broadcast(gate))
