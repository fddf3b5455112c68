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


# --------------------------------------------------------------------------
# q210: multi-class redaction — emails, URLs, long hex tokens, digit
# runs, each with its own mask and its own removal accounting (the
# first thing a privacy reviewer asks for beyond q199's digit runs).
# Classes apply in a FIXED order (email -> url -> hex -> digit) and
# each class is counted on the text as it stands after the previous
# masks, so a digit run inside an email is attributed to the email
# class, never double-counted. The fixture corpus carries no organic
# PII, so the input is a deterministic contact line synthesized from
# customer fields — name serial, derived e-mail, order URL, md5 token
# — which both engines construct identically.
# --------------------------------------------------------------------------

_RED_CLASSES = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("url", r"https?://[^\s]+", "[URL]"),
    ("hex", r"\b[0-9a-f]{16,}\b", "[HEX]"),
    ("digit", r"[0-9]{6,}", "[NUM]"),
)


def _q210_oracle() -> str:
    stages, prev = [], "t0"
    for i, (cls, pat, mask) in enumerate(_RED_CLASSES):
        cur = f"t{i + 1}"
        esc_mask = mask.replace("[", "\\[")
        src_cte = "src" if i == 0 else f"s{i - 1}"
        stages.append(
            f"s{i} AS (SELECT *,"
            f" len(regexp_extract_all({prev}, '{pat}')) AS {cls}_n,"
            f" length({prev}) - length(regexp_replace({prev}, '{pat}', '', 'g'))"
            f"   AS {cls}_c,"
            f" regexp_replace({prev}, '{pat}', '{esc_mask}', 'g') AS {cur}"
            f" FROM {src_cte})"
        )
        prev = cur
    rows = " UNION ALL ".join(
        f"SELECT '{cls}' AS class,"
        f" CAST(SUM(CASE WHEN {cls}_n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_touched,"
        f" CAST(SUM({cls}_n) AS BIGINT) AS n_hits,"
        f" CAST(SUM({cls}_c) AS BIGINT) AS chars_matched"
        f" FROM s{len(_RED_CLASSES) - 1}"
        for cls, _p, _m in _RED_CLASSES
    )
    return f"""
WITH src AS (
  SELECT c_name || ' <' || lower(replace(c_name, '#', '.')) || '@example.com>'
         || ' https://ex.example/o/' || CAST(c_custkey AS VARCHAR)
         || ' tok ' || md5(c_name) AS t0
  FROM customer
),
{", ".join(stages)}
{rows}
"""


@query("q210_redact_multiclass", oracle=_q210_oracle(), tags=("text", "privacy", "EXT"))
def q210_redact_multiclass(spark, sf_dir):
    """Sequential multi-class redaction with per-class accounting:
    (class, rows touched, match count, chars matched) for emails,
    URLs, 16+-char hex tokens, and 6+-digit runs, applied in that
    order so overlapping patterns attribute to exactly one class.
    All JVM regexp built-ins over one synthesized column — map-only
    ahead of one 4-row aggregate, so at 100 TB the scan dominates and
    nothing shuffles but four counters per class. The staged-mask
    contract (count class k on the text AFTER masks 0..k-1) is what
    the oracle pins; q199 keeps the single-class production shape."""
    cust = load(spark, sf_dir, "customer").select(
        F.concat(
            F.col("c_name"),
            F.lit(" <"),
            F.lower(F.regexp_replace("c_name", "#", ".")),
            F.lit("@example.com>"),
            F.lit(" https://ex.example/o/"),
            F.col("c_custkey").cast("string"),
            F.lit(" tok "),
            F.md5(F.col("c_name").cast("binary")),
        ).alias("t")
    )
    staged = cust
    aggs = []
    for cls, pat, mask in _RED_CLASSES:
        staged = staged.select(
            "*",
            F.size(F.regexp_extract_all("t", F.lit(pat), F.lit(0))).alias(f"{cls}_n"),
            (
                F.length("t") - F.length(F.regexp_replace("t", pat, ""))
            ).alias(f"{cls}_c"),
            F.regexp_replace("t", pat, mask.replace("[", "\\[")).alias("t2"),
        ).drop("t").withColumnRenamed("t2", "t")
        aggs.extend(
            [
                F.sum((F.col(f"{cls}_n") > 0).cast("long")).alias(f"{cls}_rows"),
                F.sum(f"{cls}_n").cast("long").alias(f"{cls}_hits"),
                F.sum(f"{cls}_c").cast("long").alias(f"{cls}_chars"),
            ]
        )
    one = staged.agg(*aggs)
    stack_args = ", ".join(
        f"'{cls}', {cls}_rows, {cls}_hits, {cls}_chars" for cls, _p, _m in _RED_CLASSES
    )
    return one.select(
        F.expr(
            f"stack({len(_RED_CLASSES)}, {stack_args})"
            " AS (class, n_rows_touched, n_hits, chars_matched)"
        )
    )
