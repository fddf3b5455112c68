"""Relational query coverage: aggregations A1-A6, joins J4-J5, windows
W1-W3, sorts/top-k O2-O3, filters P5, set ops U2, scalar families §2.8.

Each function is a complete (spark, sf_dir) -> DataFrame query over the
star schema, with a matching DuckDB oracle registered alongside.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load
from .registry import DEC, O_DSUM, dsum, query

# --------------------------------------------------------------------------
# A3: grouped aggregation — TPC-H Q1-shaped pricing summary (the flagship).
# --------------------------------------------------------------------------

_Q01_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {O_DSUM("l_quantity")} AS sum_qty,
  {O_DSUM("l_extendedprice")} AS sum_base_price,
  {O_DSUM("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
  {O_DSUM("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
  {O_DSUM("l_quantity")} / COUNT(*) AS avg_qty,
  {O_DSUM("l_extendedprice")} / COUNT(*) AS avg_price,
  {O_DSUM("l_discount")} / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("q01_pricing_summary", oracle=_Q01_ORACLE, tags=("agg", "A3", "flagship"))
def q01_pricing_summary(spark, sf_dir):
    """Grouped multi-aggregate over the fact table (SURVEY §2.4 A3).

    Scale notes: single hash aggregate; Catalyst performs partial
    (map-side) + final aggregation, so shuffle volume is #groups, not
    #rows. Filter is pushed to the parquet scan.
    """
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    cnt = F.count(F.lit(1))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("sum_charge"),
        (dsum("l_quantity") / cnt).alias("avg_qty"),
        (dsum("l_extendedprice") / cnt).alias("avg_price"),
        (dsum("l_discount") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


# --------------------------------------------------------------------------
# J4+J5+A3+O3: dim⋈fact join with broadcast + top-k.
# --------------------------------------------------------------------------

_Q02_ORACLE = f"""
SELECT c.c_custkey, c.c_name, c.c_mktsegment,
       {O_DSUM("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 10
"""


@query("q02_top_customers_by_revenue", oracle=_Q02_ORACLE, tags=("join", "J4", "J5", "O3"))
def q02_top_customers_by_revenue(spark, sf_dir):
    """customer ⋈ orders ⋈ lineitem, revenue per customer, top 10.

    Scale notes: customer is a dimension → broadcast (J5) so the fact
    table never shuffles for that join; the orders⋈lineitem equi-join
    shuffles once on orderkey. ORDER BY+LIMIT plans as
    TakeOrderedAndProject (no full sort).
    """
    c = F.broadcast(load(spark, sf_dir, "customer"))
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# P5: general predicates — range, IN-list, LIKE, boolean combination.
# --------------------------------------------------------------------------

_Q06_ORACLE = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity, l_extendedprice,
       STRFTIME(l_shipdate, '%Y-%m-%d') AS ship_date
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND l_quantity IN (1, 2, 3, 4, 5)
  AND l_returnflag LIKE 'N%'
  AND (l_discount BETWEEN 0.02 AND 0.08 OR l_tax < 0.01)
"""


@query("q06_filter_predicates", oracle=_Q06_ORACLE, tags=("filter", "P5"))
def q06_filter_predicates(spark, sf_dir):
    """Range + IN + LIKE + boolean predicates (SURVEY §2.2 P5).

    All predicates are Catalyst-pushable; the parquet scan receives
    them as PushedFilters and prunes row groups via min/max stats.
    """
    l = load(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & F.col("l_quantity").isin(1, 2, 3, 4, 5)
        & F.col("l_returnflag").like("N%")
        & (F.col("l_discount").between(0.02, 0.08) | (F.col("l_tax") < 0.01))
    ).select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_quantity",
        "l_extendedprice",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
    )


# --------------------------------------------------------------------------
# A1+A2+A4: counts and distinct counts.
# --------------------------------------------------------------------------

_Q07_ORACLE = """
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps
FROM lineitem
"""


@query("q07_distinct_counts", oracle=_Q07_ORACLE, tags=("agg", "A1", "A2", "A4"))
def q07_distinct_counts(spark, sf_dir):
    """COUNT(*) + multiple COUNT(DISTINCT) (SURVEY §2.4 A1/A2/A4).

    Catalyst expands multi-distinct into an expand + two-phase agg —
    one shuffle per distinct set, map-side partials throughout.
    """
    l = load(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


# --------------------------------------------------------------------------
# A5: rollup (multi-level totals).
# --------------------------------------------------------------------------

_Q08_ORACLE = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       {O_DSUM("l_quantity")} AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("q08_rollup_totals", oracle=_Q08_ORACLE, tags=("agg", "A5"))
def q08_rollup_totals(spark, sf_dir):
    """ROLLUP over (returnflag, linestatus) (SURVEY §2.4 A5)."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


# --------------------------------------------------------------------------
# A5: cube + grouping_id.
# --------------------------------------------------------------------------

_Q27_ORACLE = f"""
SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS orderpriority,
       GROUPING(o_orderstatus, o_orderpriority) AS gid,
       {O_DSUM("o_totalprice")} AS sum_price,
       COUNT(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("q27_cube_totals", oracle=_Q27_ORACLE, tags=("agg", "A5"))
def q27_cube_totals(spark, sf_dir):
    """CUBE with GROUPING id over orders (SURVEY §2.4 A5)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            dsum("o_totalprice").alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "gid",
            "sum_price",
            "n",
        )
    )


# --------------------------------------------------------------------------
# A6: exact order statistics (median/percentile on half-unit data).
# --------------------------------------------------------------------------

_Q28_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty
FROM lineitem
GROUP BY l_returnflag
"""


@query("q28_percentiles", oracle=_Q28_ORACLE, tags=("agg", "A6"))
def q28_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (SURVEY §2.4 A6).

    ``percentile`` (exact, interpolating) matches DuckDB
    ``quantile_cont``; quantities are integral doubles so interpolated
    values land on exact halves — bit-stable across engines.
    """
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


# --------------------------------------------------------------------------
# W1: ranking window.
# --------------------------------------------------------------------------

_Q09_ORACLE = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         RANK() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
) WHERE rn <= 3
"""


@query("q09_window_rank", oracle=_Q09_ORACLE, tags=("window", "W1"))
def q09_window_rank(spark, sf_dir):
    """Top-3 orders per customer via row_number/rank (SURVEY §2.5 W1).

    Scale notes: one shuffle on custkey + in-partition sort; the rn<=3
    filter is the standard top-k-per-group pattern (Spark also applies
    a WindowGroupLimit pushdown so partitions early-prune).
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# W3: running aggregate with explicit frame.
# --------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(24,8)))
              OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_spend,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
"""


@query("q10_running_total", oracle=_Q10_ORACLE, tags=("window", "W3"))
def q10_running_total(spark, sf_dir):
    """Per-customer running spend, rows-frame (SURVEY §2.5 W3)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(frame).cast("double").alias(
            "running_spend"
        ),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


# --------------------------------------------------------------------------
# O3: global top-k.
# --------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
"""


@query("q12_topk_orders", oracle=_Q12_ORACLE, tags=("sort", "O3"))
def q12_topk_orders(spark, sf_dir):
    """Global ORDER BY ... LIMIT k (SURVEY §2.6 O3) — plans as
    TakeOrderedAndProject: each partition keeps k rows, driver merges
    k×partitions, never a full sort."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# J4: left semi join (EXISTS).
# --------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
)
"""


@query("q13_semi_join", oracle=_Q13_ORACLE, tags=("join", "J4"))
def q13_semi_join(spark, sf_dir):
    """Customers with at least one finished order — left semi (J4)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


# --------------------------------------------------------------------------
# J4: full outer join.
# --------------------------------------------------------------------------

_Q14_ORACLE = """
WITH cn AS (
  SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
  FROM customer GROUP BY c_nationkey
), sn AS (
  SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
  FROM supplier GROUP BY s_nationkey
)
SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
       COALESCE(cn.n_customers, 0) AS n_customers,
       COALESCE(sn.n_suppliers, 0) AS n_suppliers
FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
"""


@query("q14_full_outer_join", oracle=_Q14_ORACLE, tags=("join", "J4"))
def q14_full_outer_join(spark, sf_dir):
    """Per-nation customer vs supplier counts — full outer join (J4)."""
    cn = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    sn = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    j = cn.alias("cn").join(sn.alias("sn"), "nationkey", "full")
    return j.select(
        F.col("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


# --------------------------------------------------------------------------
# U2: row-level set operations.
# --------------------------------------------------------------------------

_Q05B_ORACLE = """
SELECT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT s_nationkey AS nationkey FROM supplier
)
"""


@query("q29_intersect_nations", oracle=_Q05B_ORACLE, tags=("setop", "U2"))
def q29_intersect_nations(spark, sf_dir):
    """INTERSECT of customer-nations and supplier-nations (U2)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


_Q30_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""


@query("q30_except_nations", oracle=_Q30_ORACLE, tags=("setop", "U2"))
def q30_except_nations(spark, sf_dir):
    """EXCEPT (set difference) of nation keys (U2)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


# --------------------------------------------------------------------------
# §2.8 scalar function families: string / date / math / conditional.
# --------------------------------------------------------------------------

_Q26_ORACLE = """
SELECT p_partkey,
       UPPER(p_brand) AS brand_u,
       LOWER(p_type) AS type_l,
       SUBSTR(p_name, 1, 8) AS name_prefix,
       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
       CONCAT(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size,
       REGEXP_EXTRACT(p_type, '([A-Z]+)', 1) AS type_word,
       ABS(p_retailprice - 1000.0) AS price_dev,
       CAST(FLOOR(p_retailprice / 100.0) AS BIGINT) AS price_bucket,
       SQRT(CAST(p_size AS DOUBLE)) AS size_sqrt,
       CASE WHEN p_size >= 25 THEN 'large'
            WHEN p_size >= 10 THEN 'medium'
            ELSE 'small' END AS size_class
FROM part
"""


@query("q26_scalar_functions", oracle=_Q26_ORACLE, tags=("scalar",))
def q26_scalar_functions(spark, sf_dir):
    """String/math/conditional scalar families (SURVEY §2.8) — all
    JVM-side built-ins inside whole-stage codegen, zero UDFs."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("type_word"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("price_dev"),
        F.floor(F.col("p_retailprice") / 100.0).alias("price_bucket"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        F.when(F.col("p_size") >= 25, "large")
        .when(F.col("p_size") >= 10, "medium")
        .otherwise("small")
        .alias("size_class"),
    )


_Q31_ORACLE = """
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS INT) AS order_year,
       CAST(MONTH(o_orderdate) AS INT) AS order_month,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS order_day,
       STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
       DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
"""


@query("q31_date_functions", oracle=_Q31_ORACLE, tags=("scalar", "datetime"))
def q31_date_functions(spark, sf_dir):
    """Date/time scalar family (SURVEY §2.8): extract, trunc, diff,
    format — emitted as strings/ints for engine-neutral comparison."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")
    )
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
    )
