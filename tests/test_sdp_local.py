"""Spark 4.1 Declarative Pipelines (SDP) on the local runner: the
reference's linear ETL job declared as materialized views with an
explicit DAG, executed by dependency-order fixed point
(`sdp_local.run_pipeline`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rds_glue_s3_etl_pipeline_spark.catalog import load
from rds_glue_s3_etl_pipeline_spark.sdp_local import HAS_SDP, run_pipeline

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not HAS_SDP, reason="needs Spark 4.1 SDP")


def test_reference_job_as_declarative_pipeline(spark):
    """Extract -> merge -> audit as @sdp.materialized_view DAG.
    Deliberately declared OUT of dependency order: the runner must
    resolve order from the actual table references, not declaration
    order (the property that makes the declarative form more than
    sugar over a script)."""
    import pyspark.pipelines as sdp

    def declare():
        # audit declared FIRST, though it depends on both extracts
        @sdp.materialized_view(name="audit_unmatched")
        def audit_unmatched():
            c = spark.table("customers_mv")
            o = spark.table("orders_mv")
            return c.join(o, c.c_custkey == o.o_custkey, "left_anti")

        @sdp.materialized_view(name="orders_mv")
        def orders_mv():
            return load(spark, SF, "orders").select("o_orderkey", "o_custkey")

        @sdp.materialized_view(name="customers_mv")
        def customers_mv():
            return load(spark, SF, "customer").select("c_custkey", "c_name")

        @sdp.materialized_view(name="order_counts")
        def order_counts():
            return (
                spark.table("orders_mv")
                .groupBy("o_custkey")
                .agg(F.count(F.lit(1)).alias("n_orders"))
            )

    out = run_pipeline(spark, declare)
    assert set(out) == {
        "audit_unmatched",
        "orders_mv",
        "customers_mv",
        "order_counts",
    }
    # audit == the engine's own anti-join answer
    c = load(spark, SF, "customer")
    o = load(spark, SF, "orders")
    want = c.join(o, c.c_custkey == o.o_custkey, "left_anti").count()
    assert out["audit_unmatched"].count() == want
    # downstream view reads the materialized upstream by name
    assert spark.table("order_counts").count() == out["order_counts"].count()


def test_pipeline_stall_raises_with_flow_errors(spark):
    """A flow referencing a table nobody declares must fail loudly,
    naming the unresolvable flow — not loop forever."""
    import pyspark.pipelines as sdp

    def declare():
        @sdp.materialized_view(name="orphan")
        def orphan():
            return spark.table("never_declared_anywhere")

    with pytest.raises(RuntimeError, match="orphan"):
        run_pipeline(spark, declare)
