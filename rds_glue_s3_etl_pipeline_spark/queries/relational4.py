"""Fourth relational batch: GROUPING SETS (A5 completion beyond
rollup/cube), distribution windows (ntile / percent_rank / cume_dist,
W1 completion), deterministic stratified sampling (training-data
pipeline primitive), and a cross-join coverage matrix (J4 completion).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load
from .registry import O_DSUM, dsum, query

# --------------------------------------------------------------------------
# A5 completion: GROUPING SETS (rollup=q08 and cube=q27 are the fixed
# lattices; arbitrary sets is the general form).
# --------------------------------------------------------------------------

_Q54_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
       {O_DSUM('l_quantity')} AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@query("q54_grouping_sets", oracle=_Q54_ORACLE, tags=("agg", "A5"))
def q54_grouping_sets(spark, sf_dir):
    """Arbitrary GROUPING SETS with GROUPING() markers (SURVEY §2.4
    A5). Spark expands the sets into one aggregate over an Expand node
    — a single scan + one shuffle regardless of how many sets, so it
    scales identically to a plain groupBy."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
               CAST(SUM(CAST(l_quantity AS DECIMAL(24,8))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# --------------------------------------------------------------------------
# W1 completion: distribution window functions.
# --------------------------------------------------------------------------

_Q57_ORACLE = """
SELECT c_custkey, c_mktsegment,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


@query("q57_ntile_distribution", oracle=_Q57_ORACLE, tags=("window", "W1"))
def q57_ntile_distribution(spark, sf_dir):
    """ntile / percent_rank / cume_dist over account balance per market
    segment. The ORDER BY carries the unique c_custkey tiebreak so both
    engines assign identical bucket boundaries."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# --------------------------------------------------------------------------
# Training-data pipeline: deterministic stratified sampling. Random
# sampling is non-reproducible across engines; hashing the key gives a
# seedless, engine-portable pseudo-random order (md5 is bit-identical
# everywhere), and a row_number cap per stratum gives exact-size strata.
# --------------------------------------------------------------------------

_SAMPLE_PER_STRATUM = 20

_Q58_ORACLE = f"""
SELECT c_custkey, c_mktsegment, c_acctbal, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn
  FROM customer
)
WHERE rn <= {_SAMPLE_PER_STRATUM}
"""


@query("q58_stratified_sample", oracle=_Q58_ORACLE, tags=("sample", "EXT"))
def q58_stratified_sample(spark, sf_dir):
    """Deterministic stratified sample: exactly N rows per stratum,
    chosen by md5(key) order — reproducible across engines and runs
    (no RNG seed to disagree on). At 100 TB this is one shuffle on the
    stratum key; for heavy strata, pre-filter with a conservative
    hash-range predicate (md5 prefix) so the window only sees a few×N
    rows per stratum instead of the full stratum."""
    c = load(spark, sf_dir, "customer")
    hsh = F.md5(F.col("c_custkey").cast("string").cast("binary"))
    w = Window.partitionBy("c_mktsegment").orderBy(hsh, F.col("c_custkey"))
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= _SAMPLE_PER_STRATUM)
    )


# --------------------------------------------------------------------------
# J4 completion: cross join building a coverage matrix, left-joined to
# observed counts (zeros preserved) — the classic "report all cells
# even empty ones" shape.
# --------------------------------------------------------------------------

_Q61_ORACLE = """
WITH combos AS (
  SELECT r_name, priority
  FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority AS priority FROM orders)
),
cnts AS (
  SELECT r_name, o_orderpriority AS priority, COUNT(*) AS n
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r_name, o_orderpriority
)
SELECT combos.r_name, combos.priority,
       CAST(COALESCE(cnts.n, 0) AS BIGINT) AS n_orders
FROM combos LEFT JOIN cnts
  ON combos.r_name = cnts.r_name AND combos.priority = cnts.priority
"""


@query("q61_coverage_matrix", oracle=_Q61_ORACLE, tags=("join", "J4"))
def q61_coverage_matrix(spark, sf_dir):
    """region × priority coverage matrix with zero-preserving counts:
    cross join of two tiny dims (broadcast, no shuffle), left join onto
    the aggregated fact counts. The fact-side aggregation shuffles on
    (r_name, priority) — a handful of groups, map-side combined."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")

    combos = region.select("r_name").crossJoin(
        orders.select(F.col("o_orderpriority").alias("priority")).distinct()
    )
    cnts = (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # cnts is at most |regions| x |priorities| rows, but it sits behind
    # an aggregation so Catalyst has no size estimate — hint it.
    return (
        combos.join(F.broadcast(cnts), ["r_name", "priority"], "left")
        .select(
            "r_name",
            "priority",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders"),
        )
    )
