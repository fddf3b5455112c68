"""Unit tests for the privacy (q199/q201) and monitoring (q203-q205)
batches: edge cases the fixture data can't surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rds_glue_s3_etl_pipeline_spark.queries.monitor import (
    q203_curriculum_phases,
    q204_corpus_drift_tvd,
)
from rds_glue_s3_etl_pipeline_spark.queries.privacy import (
    _ID_PATTERN,
    _MASK,
    q201_pseudonymize_ids,
)


def test_redaction_pattern_edges(spark):
    """Digit runs shorter than 6 survive; >= 6 are masked wherever
    they appear; strings without digits pass through untouched."""
    rows = [
        ("a12345b",),          # 5 digits — below threshold
        ("a123456b",),         # 6 digits — masked
        ("x999999999y888888z",),  # two runs, both masked
        ("no digits here",),
    ]
    df = spark.createDataFrame(rows, "s string")
    out = df.select(
        F.regexp_replace("s", _ID_PATTERN, _MASK).alias("red"),
        F.size(F.regexp_extract_all("s", F.lit(_ID_PATTERN), F.lit(0))).alias("n"),
    ).collect()
    assert [r["red"] for r in out] == [
        "a12345b",
        f"a{_MASK}b",
        f"x{_MASK}y{_MASK}z",
        "no digits here",
    ]
    assert [r["n"] for r in out] == [0, 1, 2, 0]


def test_pseudonym_join_equals_raw_join(spark, sf_dir):
    """Per-segment order counts in pseudonym space must equal the
    raw-key join's counts exactly (the query's own gate only checks
    injectivity; this checks the join result itself)."""
    from rds_glue_s3_etl_pipeline_spark.catalog import load

    got = {
        r["segment"]: r["n_orders"]
        for r in q201_pseudonymize_ids(spark, sf_dir).collect()
    }
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    ords = load(spark, sf_dir, "orders").select("o_custkey")
    want = {
        r["segment"]: r["n"]
        for r in ords.join(cust, ords.o_custkey == cust.c_custkey)
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    assert all(
        r["collision_gate"] == "ok"
        for r in q201_pseudonymize_ids(spark, sf_dir).collect()
    )


def test_curriculum_phases_partition_exactly(spark, sf_dir):
    """Phases must partition the corpus: sizes sum to N, every phase
    within 1 of N/4, and token ranges must not overlap out of order."""
    from rds_glue_s3_etl_pipeline_spark.catalog import load

    rows = sorted(
        q203_curriculum_phases(spark, sf_dir).collect(), key=lambda r: r["phase"]
    )
    n = load(spark, sf_dir, "documents").count()
    assert [r["phase"] for r in rows] == [0, 1, 2, 3]
    assert sum(r["n_docs"] for r in rows) == n
    for r in rows:
        assert abs(r["n_docs"] - n / 4) <= 1
    # monotone difficulty: each phase's min_tok >= previous max... not
    # strictly (ties straddle boundaries), but min_tok must be
    # non-decreasing and max_tok non-decreasing across phases
    assert all(
        rows[i]["min_tok"] <= rows[i + 1]["min_tok"]
        and rows[i]["max_tok"] <= rows[i + 1]["max_tok"]
        for i in range(3)
    )


def test_drift_tvd_bounds(spark, sf_dir):
    """TVD is a metric on distributions: every weekly value must lie
    in [0, 1], and weeks must be consecutive (no gap rows)."""
    rows = q204_corpus_drift_tvd(spark, sf_dir).collect()
    assert len(rows) >= 1
    for r in rows:
        assert 0.0 <= r["tvd"] <= 1.0
        assert r["n_events"] > 0


def test_drift_tvd_detects_vanished_type(spark):
    """A type that disappears between weeks contributes its full
    share: week1 = 100% 'a', week2 = 100% 'b' -> TVD = 1.0."""
    rows = [
        ("2024-01-01 10:00:00", "a"),
        ("2024-01-02 10:00:00", "a"),
        ("2024-01-08 10:00:00", "b"),
        ("2024-01-09 10:00:00", "b"),
    ]
    df = spark.createDataFrame(rows, "ts_s string, event_type string").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "event_type"
    )
    # run the same pipeline inline (the registered query reads the
    # fixture; this is the operator shape on a controlled input)
    from pyspark.sql import Window

    c = df.groupBy(F.date_trunc("week", "ts").alias("wk"), "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wt = c.groupBy("wk").agg(F.sum("cnt").alias("n"))
    types = df.select("event_type").distinct()
    grid = (
        wt.crossJoin(types)
        .join(c, ["wk", "event_type"], "left")
        .select("wk", "n", "event_type", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )
    sh = grid.select(
        "wk",
        "event_type",
        (F.col("cnt") / F.col("n")).alias("share"),
        F.lag(F.col("cnt") / F.col("n"))
        .over(Window.partitionBy("event_type").orderBy("wk"))
        .alias("prev"),
    )
    tvd = (
        sh.where(F.col("prev").isNotNull())
        .groupBy("wk")
        .agg((F.lit(0.5) * F.sum(F.abs(F.col("share") - F.col("prev")))).alias("tvd"))
        .collect()
    )
    assert len(tvd) == 1
    assert tvd[0]["tvd"] == pytest.approx(1.0)
