"""Bucketed co-located join: writing both sides bucketed+sorted on the
join key must eliminate the shuffle AND the sort from the join plan —
the physical-design proof behind the 100 TB story in README."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from rds_glue_s3_etl_pipeline_spark.catalog import load
from rds_glue_s3_etl_pipeline_spark.sources.bucketing import read_table, write_bucketed

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = load(spark, SF, "orders", parallel=False)
    lineitem = load(spark, SF, "lineitem", parallel=False)
    write_bucketed(
        orders, "orders_b", "o_orderkey", n_buckets=8, path=str(base / "orders_b")
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        n_buckets=8,
        path=str(base / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, lt).join(read_table(spark, ot), "o_orderkey")
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        # Co-located buckets: no Exchange feeds the join.
        assert "Exchange" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    ot, lt = bucketed_tables
    got = (
        read_table(spark, lt)
        .join(read_table(spark, ot), "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    expect = (
        load(spark, SF, "lineitem", parallel=False)
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(load(spark, SF, "orders", parallel=False), "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {r["o_orderstatus"]: r["n"] for r in got} == {
        r["o_orderstatus"]: r["n"] for r in expect
    }


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    ot, _ = bucketed_tables
    plan = plan_of(
        read_table(spark, ot).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    )
    assert "Exchange" not in plan


def test_token_balanced_shards(spark, tmp_path):
    """Shards carry ~target total weight, never split a doc, and cover
    every doc exactly once."""
    from rds_glue_s3_etl_pipeline_spark.catalog import load
    from rds_glue_s3_etl_pipeline_spark.sources.sinks import (
        write_token_balanced_shards,
    )

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    target = 10_000
    out = str(tmp_path / "shards")
    n = write_token_balanced_shards(
        docs, out, weight_col="n_chars", order_cols=["doc_id"], target_weight_per_shard=target
    )
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    import pyspark.sql.functions as F

    stats = back.groupBy("shard").agg(F.sum("n_chars").alias("w")).collect()
    assert len(stats) == n
    max_doc = docs.agg(F.max("n_chars")).collect()[0][0]
    for r in stats:
        # every shard except possibly the last is >= target - max_doc
        # and <= target + max_doc (one-doc overshoot bound)
        assert r["w"] <= target + max_doc
    full = [r["w"] for r in sorted(stats, key=lambda r: r["shard"])][:-1]
    assert all(w >= target - max_doc for w in full)


def test_token_balanced_shards_empty_input(spark, tmp_path):
    """ADVICE r05: an empty DataFrame writes a readable schema-only
    dataset and reports zero shards instead of crashing on None + 1."""
    from rds_glue_s3_etl_pipeline_spark.sources.sinks import (
        write_token_balanced_shards,
    )

    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    out = str(tmp_path / "shards_empty")
    n = write_token_balanced_shards(
        empty, out, weight_col="n_tokens", order_cols=["doc_id"],
        target_weight_per_shard=100,
    )
    assert n == 0
    back = spark.read.parquet(out)
    assert back.count() == 0
    assert "doc_id" in back.columns
