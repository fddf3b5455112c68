"""Reference-semantics queries: precedence merge J1, anti-join audit
J2, schema union U1 — the heart of the reference job
(``/root/reference/gule_test_job.py:114-166``), exercised on synthetic
"S3 feed" / "RDS table" sides derived deterministically from ``orders``
so the DuckDB oracle can replay the exact same dataflow.

The two sides:
  s3 side  = orders with o_orderkey % 3 != 0; some cells nulled to
             exercise per-cell fallback; carries an s3-only column.
  rds side = orders with o_orderkey % 2 == 0; altered values so wins
             are observable; carries an rds-only column. Ids divisible
             by 3 only exist here → the unmatched audit set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load
from ..operators.merge import precedence_merge, unmatched_audit
from .registry import query

_SIDES_SQL = """
WITH s3_side AS (
  SELECT o_orderkey AS id,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS status,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS total,
         o_orderpriority AS s3_only
  FROM orders WHERE o_orderkey % 3 <> 0
),
rds_side AS (
  SELECT o_orderkey AS id,
         LOWER(o_orderstatus) AS status,
         o_totalprice + 1000.0 AS total,
         o_custkey AS rds_only
  FROM orders WHERE o_orderkey % 2 = 0
)
"""


def _s3_side(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("id"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
            F.col("o_orderstatus")
        ).alias("status"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None)).otherwise(
            F.col("o_totalprice")
        ).alias("total"),
        F.col("o_orderpriority").alias("s3_only"),
    )


def _rds_side(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("id"),
        F.lower("o_orderstatus").alias("status"),
        (F.col("o_totalprice") + 1000.0).alias("total"),
        F.col("o_custkey").alias("rds_only"),
    )


_Q03_ORACLE = _SIDES_SQL + """
SELECT s.id,
       COALESCE(s.status, r.status) AS status,
       COALESCE(s.total, r.total) AS total,
       s.s3_only AS s3_only,
       r.rds_only AS rds_only
FROM s3_side s LEFT JOIN rds_side r ON s.id = r.id
"""


@query("q03_precedence_merge", oracle=_Q03_ORACLE, tags=("merge", "J1", "reference"))
def q03_precedence_merge(spark, sf_dir):
    """The reference's core operator (gule_test_job.py:124-156) as a
    distributed left-outer join + per-cell coalesce.

    The reference runs this as an O(N×M) pandas loop on the driver;
    here Catalyst picks broadcast-hash or sort-merge and AQE splits
    skewed keys. Ids are unique on the fallback side in this dataset,
    so first-match dedup is exercised in the unit tests instead
    (tests/test_merge.py golden cases).
    """
    return precedence_merge(
        _s3_side(spark, sf_dir),
        _rds_side(spark, sf_dir),
        key="id",
        dedupe_fallback=False,
    )


_Q04_ORACLE = _SIDES_SQL + """
SELECT r.id, r.status, r.total, r.rds_only
FROM rds_side r
WHERE NOT EXISTS (SELECT 1 FROM s3_side s WHERE s.id = r.id)
"""


@query("q04_unmatched_audit", oracle=_Q04_ORACLE, tags=("merge", "J2", "reference"))
def q04_unmatched_audit(spark, sf_dir):
    """The data-quality audit (gule_test_job.py:166): fallback rows
    with no primary match, as a left anti join instead of a driver-side
    python-set membership scan."""
    return unmatched_audit(_rds_side(spark, sf_dir), _s3_side(spark, sf_dir), key="id")


_Q05_ORACLE = _SIDES_SQL + """
SELECT id, status, total, s3_only, NULL AS rds_only FROM s3_side
UNION ALL
SELECT id, status, total, NULL AS s3_only, rds_only FROM rds_side
"""


@query("q05_schema_union", oracle=_Q05_ORACLE, tags=("setop", "U1", "reference"))
def q05_schema_union(spark, sf_dir):
    """Schema-merging union (gule_test_job.py:114): rows from two
    different-schema tables over the union of their columns —
    unionByName(allowMissingColumns=True)."""
    s3 = _s3_side(spark, sf_dir)
    rds = _rds_side(spark, sf_dir)
    out = s3.unionByName(rds, allowMissingColumns=True)
    # Pin column order: primary columns first, then fallback-only (P1).
    cols = list(s3.columns) + [c for c in rds.columns if c not in s3.columns]
    return out.select(
        *[
            F.col(c).cast("bigint").alias(c) if c == "rds_only" else F.col(c)
            for c in cols
        ]
    )
