"""Fifth batch: classic decision-support query shapes (TPC-H-style
Q3/Q4/Q5/Q10/Q14/Q16/Q17 adapted to this star schema), exact
moment-based statistics, and the distributed global running total.

These widen SURVEY §2 coverage: multi-way dim⋈fact joins with
broadcast dims (J4/J5), EXISTS/correlated-scalar subqueries (P5/J4),
conditional aggregation, COUNT(DISTINCT) at group level (A4), and the
O1 prefix operator with a value payload.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load
from ..operators.prefix import global_running_sum
from .registry import DEC, O_DSUM, dsum, query

# --------------------------------------------------------------------------
# Q3-shaped: shipping-priority revenue — 3-way join, filter both sides,
# top-10 by revenue.
# --------------------------------------------------------------------------

_Q67_ORACLE = f"""
SELECT l.l_orderkey,
       {O_DSUM("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       epoch_ms(o.o_orderdate) AS orderdate_ms
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


@query("q67_shipping_priority", oracle=_Q67_ORACLE, tags=("join", "J4", "J5", "O3"))
def q67_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem,
    revenue per order, top 10. Customer (dim) broadcasts; the
    orders⋈lineitem side carries both pushed-down date filters into the
    scans; final top-k is TakeOrderedAndProject (no global sort)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("orderdate_ms"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q4-shaped: order-priority counts via EXISTS (late-shipping lineitems).
# --------------------------------------------------------------------------

_Q68_ORACLE = """
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority
"""


@query("q68_order_priority_exists", oracle=_Q68_ORACLE, tags=("join", "J4", "subquery"))
def q68_order_priority_exists(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS with a correlated inequality, expressed
    as a left-semi join whose non-equi part (shipdate > orderdate+60d)
    rides in the join condition — one shuffle on orderkey, no
    subquery re-execution."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    semi = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.date_add(o.o_orderdate, 60)),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


# --------------------------------------------------------------------------
# Q5-shaped: regional supplier volume — 6-table star join.
# --------------------------------------------------------------------------

_Q69_ORACLE = f"""
SELECT n.n_name,
       {O_DSUM("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
"""


@query("q69_local_supplier_volume", oracle=_Q69_ORACLE, tags=("join", "J4", "J5"))
def q69_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: six-table join where every dimension
    (customer, supplier, nation, region) broadcasts and only the
    orders⋈lineitem fact-fact join shuffles — the canonical star-join
    plan at 100 TB. The c_nationkey = s_nationkey local-supplier
    condition rides on the supplier broadcast join."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Q14-shaped: promo revenue share — conditional aggregation, one row.
# --------------------------------------------------------------------------

_Q70_ORACLE = f"""
SELECT CAST(100.0 AS DOUBLE)
       * {O_DSUM("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
       / {O_DSUM("l.l_extendedprice * (1 - l.l_discount)")} AS promo_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
  AND l.l_shipdate < TIMESTAMP '1997-10-01'
"""


@query("q70_promo_revenue", oracle=_Q70_ORACLE, tags=("join", "agg", "J5"))
def q70_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional-aggregation ratio. Part broadcasts;
    both sums are decimal-exact so the double division is bit-identical
    across engines."""
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg((F.lit(100.0) * dsum(promo) / dsum(rev)).alias("promo_pct"))
    )


# --------------------------------------------------------------------------
# Q10-shaped: top customers by returned-item revenue.
# --------------------------------------------------------------------------

_Q71_ORACLE = f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       {O_DSUM("l.l_extendedprice * (1 - l.l_discount)")} AS lost_revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-07-01'
  AND o.o_orderdate < TIMESTAMP '1997-10-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY lost_revenue DESC, c.c_custkey
LIMIT 20
"""


@query("q71_returned_item_losses", oracle=_Q71_ORACLE, tags=("join", "J4", "J5", "O3"))
def q71_returned_item_losses(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20.
    Returnflag filter pushes into the lineitem scan; customer and
    nation broadcast onto the fact join."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "lost_revenue"
            )
        )
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q16-shaped: supplier variety per part attribute (group-level DISTINCT).
# --------------------------------------------------------------------------

_Q72_ORACLE = """
SELECT p.p_brand, p.p_type,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#5' AND p.p_size IN (1, 2, 3, 4, 5)
GROUP BY p.p_brand, p.p_type
"""


@query("q72_supplier_variety", oracle=_Q72_ORACLE, tags=("join", "agg", "A4"))
def q72_supplier_variety(spark, sf_dir):
    """TPC-H Q16 shape: COUNT(DISTINCT) per group after a broadcast
    dim join with IN/<> predicates (pushed to the part scan). Catalyst
    plans distinct-aggregate as a two-level expand+agg — shuffle keyed
    on (brand, type, suppkey) partials, no row explosion."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17-shaped: small-quantity revenue via correlated per-part average.
# --------------------------------------------------------------------------

_Q73_ORACLE = f"""
SELECT {O_DSUM("l.l_extendedprice")} / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < (
    SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


@query("q73_small_quantity_revenue", oracle=_Q73_ORACLE, tags=("join", "subquery", "agg"))
def q73_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into a pre-aggregated join — the standard
    rewrite: aggregate lineitem once per partkey, join back, filter.
    The per-part averages frame is small (one row per part) so it
    broadcasts."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(avg_qty), l.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# A6: correlation / covariance / stddev / regression slope — computed
# from decimal-exact moment sums so both engines do the identical
# double arithmetic on identical inputs (bit-stable, no rounding).
# --------------------------------------------------------------------------

_MOMENTS = """
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) AS sx,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(CAST(round(l_quantity * 100) AS BIGINT)
                     * CAST(round(l_quantity * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(CAST(round(l_quantity * 100) AS BIGINT)
                     * CAST(round(l_extendedprice * 100) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
"""

_Q74_ORACLE = f"""
WITH m AS ({_MOMENTS})
SELECT l_returnflag,
       (n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
         AS corr_qty_price,
       (n * sxy - sx * sy) / (n * n) / 10000.0 AS covar_pop,
       sqrt((n * sxx - sx * sx) / (n * n)) / 100.0 AS stddev_pop_qty,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS regr_slope
FROM m
"""


@query("q74_moment_stats", oracle=_Q74_ORACLE, tags=("agg", "A6"))
def q74_moment_stats(spark, sf_dir):
    """Correlation, population covariance/stddev, and regression slope
    per group, derived from exact integer-cents moment sums (Σx, Σy,
    Σx², Σy², Σxy as bigint/decimal(38,0)) — one hash aggregate, and
    the closed-form double math is bit-identical across engines because
    the integer→double conversion is correctly rounded from the SAME
    exact integer in both (a decimal-scaled sum would double-round in
    DuckDB: int128→double then ÷10^scale). Correlation and slope are
    scale-invariant; covar/stddev de-scale by the same literal on both
    sides. The scalable alternative to multi-pass stats UDAFs."""
    l = load(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity") * 100).cast("bigint")
    y = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    big = "decimal(38,0)"
    m = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * x).cast(big)).cast("double").alias("sxx"),
        F.sum((y * y).cast(big)).cast("double").alias("syy"),
        F.sum((x * y).cast(big)).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_num = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return m.select(
        "l_returnflag",
        (cov_num / F.sqrt(var_x * var_y)).alias("corr_qty_price"),
        (cov_num / (n * n) / F.lit(10000.0)).alias("covar_pop"),
        (F.sqrt(var_x / (n * n)) / F.lit(100.0)).alias("stddev_pop_qty"),
        (cov_num / var_x).alias("regr_slope"),
    )


# --------------------------------------------------------------------------
# O1 + W3 at scale: global running revenue via the two-pass prefix
# operator (no single-partition window).
# --------------------------------------------------------------------------

_Q75_ORACLE = """
SELECT o_orderkey,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(24,8)))
            OVER (ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS VARCHAR) AS DOUBLE) AS running_revenue
FROM orders
"""


@query("q75_global_running_revenue", oracle=_Q75_ORACLE, tags=("window", "W3", "O1"))
def q75_global_running_revenue(spark, sf_dir):
    """Global (unpartitioned) running total — the operation Spark's
    window would execute on ONE task — via operators/prefix.py
    global_running_sum: range-shuffle on the order key, per-partition
    prefix sums, broadcast offsets. Decimal-exact so the distributed
    recombination equals the serial sum."""
    o = load(spark, sf_dir, "orders")
    return global_running_sum(
        o,
        ["o_orderdate", "o_orderkey"],
        F.col("o_totalprice").cast(DEC),
        out_col="__rs",
    ).select(
        "o_orderkey",
        # string hop: correctly-rounded decimal->double in both engines
        # (see registry.dsum).
        F.col("__rs").cast("string").cast("double").alias("running_revenue"),
    )


# --------------------------------------------------------------------------
# W1 distribution functions: percent_rank / cume_dist.
# --------------------------------------------------------------------------

_Q85_ORACLE = """
SELECT c_custkey, c_mktsegment,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


@query("q85_percent_rank", oracle=_Q85_ORACLE, tags=("window", "W1"))
def q85_percent_rank(spark, sf_dir):
    """Relative-position window functions (percent_rank, cume_dist)
    per market segment. Exact rationals of ranks — deterministic
    doubles in both engines. One shuffle on the partition key."""
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
