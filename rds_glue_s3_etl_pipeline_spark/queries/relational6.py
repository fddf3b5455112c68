"""Sixth batch: the remaining classic decision-support shapes —
TPC-H Q2/Q7/Q8/Q9/Q11/Q12/Q13/Q15/Q18/Q19/Q20/Q21/Q22 adapted to this
star schema (no partsupp/shipmode/phone columns, so cost and code
derivations use the columns that exist; the JOIN/subquery shape of each
original is preserved).

Reference parity note: the reference (`/root/reference/gule_test_job.py`)
has no SQL layer at all — these queries exist to make the engine a
complete query layer over the same data model (SURVEY §2 EXT, north
star), each verified against a DuckDB oracle.

Scale notes common to the batch: dimension tables (nation, supplier,
part at these ratios) are broadcast; fact-fact joins shuffle on their
join key once; aggregates are partial+final hash aggs; no query
collects to the driver or uses an unpartitioned window.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load
from .registry import O_DSUM, dsum, query

# --------------------------------------------------------------------------
# Q7-shaped: volume shipping between two nations, by direction and year.
# --------------------------------------------------------------------------

_Q87_ORACLE = f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       {O_DSUM("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
"""


@query("q87_volume_shipping", oracle=_Q87_ORACLE, tags=("join", "J4", "J5"))
def q87_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional trade volume between two nations
    by ship year. All four dims (supplier, customer, nation x2)
    broadcast; lineitem⋈orders is the only shuffle; the disjunctive
    nation-pair predicate is applied after the cheap broadcast joins so
    the fact scan stays pushdown-friendly (date range prunes)."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Q8-shaped: market share of one supplier nation inside a region, by year.
# --------------------------------------------------------------------------

_Q88_ORACLE = f"""
SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST({O_DSUM("CASE WHEN sn.n_name = 'NATION_3' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
            / {O_DSUM("l.l_extendedprice * (1 - l.l_discount)")} AS DOUBLE) AS mkt_share
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cnat ON c.c_nationkey = cnat.n_nationkey
JOIN region r   ON cnat.n_regionkey = r.r_regionkey
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
GROUP BY o_year
"""


@query("q88_market_share", oracle=_Q88_ORACLE, tags=("join", "agg", "J5"))
def q88_market_share(spark, sf_dir):
    """TPC-H Q8 shape: a nation's share of PROMO-part revenue sold into
    ASIA customers, per order year. The share is a ratio of two exact
    decimal sums (conditional numerator), so the double result is
    bit-identical across engines. Eight-table join: every dim
    broadcasts, lineitem⋈orders is the single shuffle."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    cnat = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cnat), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0)))
                / dsum(vol)
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q9-shaped: product-line profit by supplier nation and year.
# --------------------------------------------------------------------------

_Q89_ORACLE = f"""
SELECT sn.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       {O_DSUM("l.l_extendedprice * (1 - l.l_discount) - 0.5 * p.p_retailprice * l.l_quantity")} AS profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY nation, o_year
"""


@query("q89_product_profit", oracle=_Q89_ORACLE, tags=("join", "agg", "J5"))
def q89_product_profit(spark, sf_dir):
    """TPC-H Q9 shape with the schema's cost proxy: profit =
    revenue - 0.5*retailprice*qty (no partsupp.supplycost in this
    model), for parts whose name contains 'widget', by supplier nation
    and order year. LIKE filter prunes part before the broadcast."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    sn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(dsum(profit).alias("profit"))
    )


# --------------------------------------------------------------------------
# Q12-shaped: shipping-speed buckets vs order priority (conditional agg).
# --------------------------------------------------------------------------

_Q90_ORACLE = """
SELECT CASE WHEN l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY THEN 'FAST'
            WHEN l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY THEN 'NORMAL'
            ELSE 'SLOW' END AS ship_bucket,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY ship_bucket
"""


@query("q90_shipping_speed_priority", oracle=_Q90_ORACLE, tags=("join", "agg", "P5"))
def q90_shipping_speed_priority(spark, sf_dir):
    """TPC-H Q12 shape with a derived speed bucket standing in for
    l_shipmode (absent here): how many urgent vs non-urgent lines fall
    in each latency bucket. Single fact-fact join on orderkey plus
    conditional counts (map-side partial aggregation)."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = (
        F.when(F.col("l_shipdate") < F.date_add(F.col("o_orderdate"), 30), "FAST")
        .when(F.col("l_shipdate") < F.date_add(F.col("o_orderdate"), 90), "NORMAL")
        .otherwise("SLOW")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q13-shaped: customer order-count distribution (left outer + double agg).
# --------------------------------------------------------------------------

_Q91_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
"""


@query("q91_customer_distribution", oracle=_Q91_ORACLE, tags=("join", "agg", "J4"))
def q91_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: histogram of per-customer order counts, with
    the filter inside the LEFT JOIN condition (customers with zero
    qualifying orders must appear with c_count = 0). COUNT(o_orderkey)
    over the null-extended rows gives exactly that."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --------------------------------------------------------------------------
# Q15-shaped: top supplier(s) by quarterly revenue (scalar MAX subquery).
# --------------------------------------------------------------------------

_Q92_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {O_DSUM("l_extendedprice * (1 - l_discount)")} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@query("q92_top_supplier", oracle=_Q92_ORACLE, tags=("join", "agg", "subquery"))
def q92_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    revenue — the scalar MAX subquery becomes a broadcast join against
    a 1-row aggregate, so the revenue CTE is computed once and reused
    (no correlated re-execution). Revenue is decimal-exact, making the
    equality comparison deterministic in both engines."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q18-shaped: large-volume orders (HAVING over a fact aggregate, re-join).
# --------------------------------------------------------------------------

_Q93_ORACLE = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       epoch_ms(o.o_orderdate) AS orderdate_ms,
       o.o_totalprice,
       {O_DSUM("l.l_quantity")} AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(24,8))) > 180
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 25
"""


@query("q93_large_volume_customers", oracle=_Q93_ORACLE, tags=("join", "agg", "subquery", "O3"))
def q93_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: customers behind orders whose total quantity
    exceeds a threshold. The IN-subquery is a semi join against the
    HAVING aggregate — one shuffle on orderkey shared by both the
    aggregate and the re-join, then top-25 via TakeOrderedAndProject."""
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(24,8)")).alias("q"))
        .filter(F.col("q") > 180)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("orderdate_ms"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# Q19-shaped: disjunctive multi-attribute predicate revenue.
# --------------------------------------------------------------------------

_Q94_ORACLE = f"""
SELECT {O_DSUM("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 15  AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#7'  AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 40)
"""


@query("q94_disjunctive_revenue", oracle=_Q94_ORACLE, tags=("join", "P5", "J5"))
def q94_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: OR of three (brand, size-range, qty-range)
    conjunctions across the join. Part is pre-filtered to the union of
    brand/size triples before broadcasting (shrinks the build side);
    the mixed lineitem+part disjunction evaluates post-join."""
    p = load(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(10, 30))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(20, 50))
    )
    l = load(spark, sf_dir, "lineitem")
    cond = (
        (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Q2-shaped: cheapest-supplier-per-part (correlated MIN over candidates).
# --------------------------------------------------------------------------

_Q95_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (
  SELECT p.p_partkey, s.s_suppkey, s.s_name, s.s_acctbal
  FROM part p
  JOIN ps ON ps.l_partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = ps.l_suppkey
  WHERE p.p_type = 'PROMO' AND p.p_size < 10
)
SELECT p_partkey, s_suppkey, s_name, s_acctbal
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
                               ORDER BY s_acctbal, s_suppkey) AS rn
  FROM cand
) t
WHERE rn = 1
"""


@query("q95_cheapest_supplier", oracle=_Q95_ORACLE, tags=("join", "window", "subquery"))
def q95_cheapest_supplier(spark, sf_dir):
    """TPC-H Q2 shape with this schema's cost proxy: for each small
    PROMO part, the supplier with minimum account balance among those
    who actually shipped it (distinct partkey/suppkey pairs from
    lineitem stand in for partsupp). The correlated MIN subquery is a
    row_number window over the candidate set — one shuffle on partkey,
    no per-part re-execution."""
    l = load(spark, sf_dir, "lineitem")
    ps = l.select("l_partkey", "l_suppkey").distinct()
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "PROMO") & (F.col("p_size") < 10)
    )
    s = load(spark, sf_dir, "supplier")
    cand = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal")
    )
    w = Window.partitionBy("p_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# Q11-shaped: nations holding an outsized share of shipped inventory value.
# --------------------------------------------------------------------------

_Q96_ORACLE = f"""
WITH nv AS (
  SELECT sn.n_name AS nation,
         {O_DSUM("l.l_quantity * p.p_retailprice")} AS value
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
  GROUP BY nation
)
SELECT nation, value FROM nv
WHERE value > (SELECT CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) * 0.05 FROM nv)
"""


@query("q96_important_nations", oracle=_Q96_ORACLE, tags=("join", "agg", "subquery"))
def q96_important_nations(spark, sf_dir):
    """TPC-H Q11 shape: supplier nations whose shipped inventory value
    (qty x retailprice — no partsupp here) exceeds 5% of the global
    total. The scalar total is a 1-row broadcast cross join, so the
    per-nation aggregate is computed once and reused for both sides."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    sn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    nv = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy("nation")
        .agg(dsum(F.col("l_quantity") * F.col("p_retailprice")).alias("value"))
    )
    total = nv.agg(
        (F.sum(F.col("value").cast("decimal(30,8)")).cast("double") * 0.05).alias(
            "threshold"
        )
    )
    return (
        nv.join(F.broadcast(total), F.col("value") > F.col("threshold"))
        .select("nation", "value")
    )


# --------------------------------------------------------------------------
# Q21-shaped: suppliers whose line uniquely held up multi-supplier orders.
# --------------------------------------------------------------------------

_Q97_ORACLE = """
SELECT s.s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN orders o   ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
"""


@query("q97_waiting_suppliers", oracle=_Q97_ORACLE, tags=("join", "subquery", "O3"))
def q97_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (l_shipdate stands in for the missing
    receipt/commit dates): in finished multi-supplier orders, count
    lines whose supplier shipped strictly last. EXISTS / NOT EXISTS
    become left-semi / left-anti self-joins on orderkey; all three
    lineitem scans shuffle on the same key, so AQE coalesces them into
    one exchange reuse."""
    l = load(spark, sf_dir, "lineitem")
    l1 = l.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = l.select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_suppkey").alias("r_suppkey"),
        F.col("l_shipdate").alias("r_shipdate"),
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    semi = l1.join(
        l2,
        (l1.l_orderkey == l2.r_orderkey) & (l1.l_suppkey != l2.r_suppkey),
        "left_semi",
    )
    anti = semi.join(
        l2,
        (semi.l_orderkey == l2.r_orderkey)
        & (semi.l_suppkey != l2.r_suppkey)
        & (l2.r_shipdate > semi.l_shipdate),
        "left_anti",
    )
    return (
        anti.join(o, anti.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), anti.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q22-shaped: well-funded customers with no orders, by derived code.
# --------------------------------------------------------------------------

_Q98_ORACLE = """
WITH pool AS (
  SELECT c_custkey % 7 AS code, c_custkey, c_acctbal
  FROM customer WHERE c_custkey % 7 IN (1, 3, 5)
)
SELECT code,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(24,8))) AS DOUBLE) AS totacctbal
FROM pool p
WHERE p.c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(24,8))) / COUNT(*) AS DOUBLE)
    FROM pool WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = p.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1999-01-01'
  )
GROUP BY code
"""


@query("q98_idle_rich_customers", oracle=_Q98_ORACLE, tags=("join", "subquery", "agg"))
def q98_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape (custkey mod 7 stands in for the missing phone
    country code): customers in selected codes with above-average
    positive balances and no recent orders. The scalar AVG broadcasts
    as a 1-row aggregate (exact decimal ratio); the NOT EXISTS is a
    left-anti join against the date-filtered orders (filter pushed
    into the anti-join's build side scan)."""
    pool = (
        load(spark, sf_dir, "customer")
        .filter((F.col("c_custkey") % 7).isin(1, 3, 5))
        .select(
            (F.col("c_custkey") % 7).alias("code"), "c_custkey", "c_acctbal"
        )
    )
    avg = pool.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(24,8)")) / F.count(F.lit(1))
        )
        .cast("double")
        .alias("avg_bal")
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    return (
        pool.join(F.broadcast(avg), F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy("code")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# Q20-shaped: suppliers dominating shipments of a part family.
# --------------------------------------------------------------------------

_Q99_ORACLE = """
WITH pq AS (
  SELECT l.l_partkey, l.l_suppkey,
         SUM(CAST(l.l_quantity AS DECIMAL(24,8))) AS sq
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'red%'
  GROUP BY l.l_partkey, l.l_suppkey
),
tot AS (SELECT l_partkey, SUM(sq) AS tq FROM pq GROUP BY l_partkey)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM pq
JOIN tot ON tot.l_partkey = pq.l_partkey
JOIN supplier s ON s.s_suppkey = pq.l_suppkey
WHERE pq.sq > 0.15 * tot.tq
"""


@query("q99_dominant_suppliers", oracle=_Q99_ORACLE, tags=("join", "agg", "subquery"))
def q99_dominant_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who shipped more than 15% of the
    total quantity of any 'red' part. Per-(part,supplier) and per-part
    aggregates share the partkey shuffle; quantities are summed as
    decimals so the 15% threshold compares exactly in both engines."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load(spark, sf_dir, "supplier")
    pq = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(24,8)")).alias("sq"))
    )
    tot = pq.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("sq").alias("tq")
    )
    return (
        pq.join(tot, pq.l_partkey == tot.t_partkey)
        .filter(F.col("sq") > 0.15 * F.col("tq"))
        .join(F.broadcast(s), pq.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )


# --------------------------------------------------------------------------
# Q21 again, as the aggregation rewrite you'd run at 100 TB.
# --------------------------------------------------------------------------

_Q102_ORACLE = _Q97_ORACLE


@query("q102_waiting_suppliers_agg", oracle=_Q102_ORACLE, tags=("join", "agg", "O3"))
def q102_waiting_suppliers_agg(spark, sf_dir):
    """Same semantics as q97_waiting_suppliers, rewritten without the
    two lineitem self-joins: per-order aggregates (supplier count, max
    ship date, its holder count, runner-up max) decide each line's
    EXISTS / NOT EXISTS outcome arithmetically. A line qualifies iff
    the order has >=2 suppliers and no OTHER supplier shipped later —
    i.e. shipdate >= the runner-up max (m2) when this supplier uniquely
    holds the order max, else >= the order max (m1). All per-order
    stats come from window functions over ONE hash partitioning of
    lineitem on l_orderkey — a single shuffle and zero self-joins,
    vs. three shuffles + two potentially fanning-out joins in the
    literal EXISTS form (q97).
    """
    # One explicit hash partitioning on l_orderkey: HashPartitioning on
    # a subset of the grouping/join keys satisfies every downstream
    # ClusteredDistribution here — groupBy(ok,sk), groupBy(ok), and the
    # ok/ok+sk joins all reuse this single exchange instead of
    # re-shuffling on composite keys.
    w = Window.partitionBy("l_orderkey")
    l = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .withColumn("m1", F.max("l_shipdate").over(w))
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
    )
    # Second window pass (same partitioning, same stage): who holds the
    # max, and the runner-up ship date.
    l = l.withColumn(
        "m1_holders",
        F.collect_set(
            F.when(F.col("l_shipdate") == F.col("m1"), F.col("l_suppkey"))
        ).over(w),
    ).withColumn(
        "m2",
        F.max(
            F.when(F.col("l_shipdate") < F.col("m1"), F.col("l_shipdate"))
        ).over(w),
    )
    sole_max_holder = (F.size("m1_holders") == 1) & F.array_contains(
        "m1_holders", F.col("l_suppkey")
    )
    max_other = F.when(sole_max_holder, F.col("m2")).otherwise(F.col("m1"))
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    return (
        l.filter((F.col("n_supp") >= 2) & (F.col("l_shipdate") >= max_other))
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Salted skew join, driver-verified: output must equal the plain join.
# --------------------------------------------------------------------------

_Q110_ORACLE = f"""
SELECT s.s_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       {O_DSUM("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
GROUP BY s.s_nationkey
"""


@query("q110_salted_skew_join", oracle=_Q110_ORACLE, tags=("join", "skew", "J5"))
def q110_salted_skew_join(spark, sf_dir):
    """The explicit salting fallback (operators/skew.py) on a real
    join: lineitem⋈supplier via (key, salt) so a hot supplier key
    spreads over 8 reduce partitions. The oracle is the PLAIN join —
    salting must be invisible in the result. This is the opt-in path
    for hot keys AQE's skew-split can't reach (broadcast-disabled
    shuffled hash joins, pre-AQE clusters); the suppkey→nation rollup
    proves cardinality is preserved exactly."""
    from ..operators.skew import salted_join

    l = load(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_extendedprice", "l_discount"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = salted_join(l, s, on="s_suppkey", how="inner", salt_n=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )
