"""Scalar-family completion (SURVEY §2.8): extended string functions,
time conversions, array ops over embeddings, map/JSON ops over event
props, distinct-set collection, and the sliding-window batch analog.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load
from .registry import O_DSUM, dsum, query

# --------------------------------------------------------------------------
# String family, part 2.
# --------------------------------------------------------------------------

_Q49_ORACLE = """
SELECT p_partkey,
       LPAD(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
       REVERSE(p_brand) AS brand_rev,
       REPEAT(LEFT(p_type, 2), 3) AS type_echo,
       CAST(STRPOS(p_name, 'a') AS BIGINT) AS first_a,
       TRANSLATE(p_brand, '#', '-') AS brand_dash,
       SPLIT_PART(p_type, ' ', 1) AS type_head,
       CAST(LENGTH(p_name) - LENGTH(REPLACE(p_name, ' ', '')) AS BIGINT) AS n_spaces
FROM part
"""


@query("q49_string_functions2", oracle=_Q49_ORACLE, tags=("scalar", "string"))
def q49_string_functions2(spark, sf_dir):
    """Extended string family: pad, reverse, repeat, position,
    translate, split_part — all codegen built-ins."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.substring("p_type", 1, 2), 3).alias("type_echo"),
        F.instr("p_name", "a").cast("long").alias("first_a"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("type_head"),
        (F.length("p_name") - F.length(F.replace(F.col("p_name"), F.lit(" "), F.lit(""))))
        .cast("long")
        .alias("n_spaces"),
    )


# --------------------------------------------------------------------------
# Time conversions.
# --------------------------------------------------------------------------

_Q50_ORACLE = """
SELECT o_orderkey,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       STRFTIME(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
       STRFTIME(o_orderdate - INTERVAL 1 MONTH, '%Y-%m-%d') AS prior_month,
       CAST(DAYOFYEAR(o_orderdate) AS BIGINT) AS doy,
       CAST(QUARTER(o_orderdate) AS BIGINT) AS qtr,
       CAST(WEEKOFYEAR(o_orderdate) AS BIGINT) AS woy
FROM orders WHERE o_orderkey % 4 = 1
"""


@query("q50_time_conversions", oracle=_Q50_ORACLE, tags=("scalar", "datetime"))
def q50_time_conversions(spark, sf_dir):
    """Epoch round-trips, interval arithmetic, calendar extraction
    (SURVEY §2.8 date/time family)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 4 == 1)
    return o.select(
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format(F.date_add(F.col("o_orderdate"), 90), "yyyy-MM-dd").alias(
            "due_date"
        ),
        F.date_format(F.add_months(F.col("o_orderdate"), -1), "yyyy-MM-dd").alias(
            "prior_month"
        ),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.weekofyear("o_orderdate").cast("long").alias("woy"),
    )


# --------------------------------------------------------------------------
# Array family over embeddings.
# --------------------------------------------------------------------------

_Q51_ORACLE = """
SELECT vec_id,
       CAST(array_length(embedding) AS BIGINT) AS dim,
       CAST(embedding[1] AS DOUBLE) AS head,
       CAST(embedding[64] AS DOUBLE) AS tail,
       ROUND(CAST(list_sum(CAST(embedding[1:8] AS DOUBLE[])) AS DOUBLE), 6) AS head8_sum,
       CAST(list_contains(CAST(embedding AS DOUBLE[]), 0.0) AS BIGINT) AS has_zero
FROM embeddings
"""


@query("q51_array_functions", oracle=_Q51_ORACLE, tags=("scalar", "array"))
def q51_array_functions(spark, sf_dir):
    """Array family (SURVEY §2.8): size, element access, slice-sum,
    containment — the building blocks of the vector ops."""
    e = load(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at(v, 1).alias("head"),
        F.element_at(v, 64).alias("tail"),
        F.round(
            F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("head8_sum"),
        F.array_contains(v, 0.0).cast("long").alias("has_zero"),
    )


# --------------------------------------------------------------------------
# Map/JSON family over event props.
# --------------------------------------------------------------------------

_Q52_ORACLE = """
SELECT event_id,
       CAST(json_array_length(json_keys(props)) AS BIGINT) AS n_keys,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       CAST(json_extract_string(props, '$.missing') IS NULL AS BIGINT) AS missing_is_null
FROM events WHERE event_id % 5 = 0
"""


@query("q52_map_json_ops", oracle=_Q52_ORACLE, tags=("scalar", "json", "events"))
def q52_map_json_ops(spark, sf_dir):
    """Map/JSON family: parse props into MapType, key count, element
    access, missing-key semantics (SURVEY §2.8 map/JSON)."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") % 5 == 0)
    m = F.from_json("props", "map<string,string>")
    return e.select(
        "event_id",
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
        F.element_at(m, "k").cast("long").alias("k_val"),
        F.element_at(m, "missing").isNull().cast("long").alias("missing_is_null"),
    )


# --------------------------------------------------------------------------
# A2: distinct-set collection as a deterministic sorted array.
# --------------------------------------------------------------------------

_Q53_ORACLE = """
SELECT event_type,
       array_to_string(array_agg(DISTINCT user_id % 7 ORDER BY user_id % 7), ',')
         AS user_buckets,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
"""


@query("q53_collect_set", oracle=_Q53_ORACLE, tags=("agg", "A2"))
def q53_collect_set(spark, sf_dir):
    """Distinct-set collection (the reference's python id-set at
    gule_test_job.py:121, as a distributed aggregate); the set is
    serialized to a sorted comma-joined scalar so the result is a
    hashable, engine-neutral value (array columns can't be canonically
    hashed by the differential harness)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_set(F.col("user_id") % 7)),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("user_buckets"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
# T1 sliding-window batch analog.
# --------------------------------------------------------------------------

_Q55_ORACLE = f"""
WITH assigned AS (
  SELECT date_trunc('hour', ts) AS w_start, event_type, value FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS w_start, event_type, value FROM events
)
SELECT epoch_ms(w_start) AS window_ms, event_type,
       COUNT(*) AS n, {O_DSUM("value")} AS sum_value
FROM assigned GROUP BY 1, 2
"""


@query("q55_sliding_window", oracle=_Q55_ORACLE, tags=("window", "T1", "events"))
def q55_sliding_window(spark, sf_dir):
    """Sliding 2h/1h window aggregate via F.window — every event lands
    in two windows; the oracle states the expansion explicitly (union
    of shifted hour-truncations)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_ms"),
            "event_type",
            "n",
            "sum_value",
        )
    )
