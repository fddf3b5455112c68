"""Custom Python DataSource (json_feed): partition-per-file planning,
Arrow-batch reads, and filter pushdown parity with spark.read.json."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from rds_glue_s3_etl_pipeline_spark.sources.feed_source import (
    JsonFeedDataSource,
    register_feed_source,
)

SCHEMA = "id long, name string, score double, lang string"


@pytest.fixture()
def feed_dir(tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    (d / "a.json").write_text(json.dumps([
        {"id": 1, "name": "alice", "score": 1.5, "lang": "en"},
        {"id": 2, "name": "bob", "score": None, "lang": "de"},
    ]))
    (d / "b.json").write_text(json.dumps([
        {"id": 3, "name": "carol", "score": 3.0, "lang": "en"},
    ]))
    (d / "c.json").write_text(json.dumps(
        {"id": 4, "name": "dave", "score": 4.0, "lang": "fr"}  # single object
    ))
    return str(d)


def _registered(spark):
    register_feed_source(spark)
    return spark


def test_feed_source_reads_all_files(spark, feed_dir):
    df = _registered(spark).read.format("json_feed").schema(SCHEMA).load(feed_dir)
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2]["score"] is None
    assert rows[4]["name"] == "dave"
    # one partition per file = distributed ingest, not a driver loop
    assert df.rdd.getNumPartitions() == 3


def test_feed_source_matches_spark_read_json(spark, feed_dir, tmp_path):
    """Parity with the built-in reader on the same records."""
    df = _registered(spark).read.format("json_feed").schema(SCHEMA).load(feed_dir)
    got = {tuple(r) for r in df.collect()}
    # spark.read.json can't read the array files as one dataset the
    # same way (multiLine per file), so build expectation directly.
    expect = {
        (1, "alice", 1.5, "en"),
        (2, "bob", None, "de"),
        (3, "carol", 3.0, "en"),
        (4, "dave", 4.0, "fr"),
    }
    assert got == expect


def test_feed_source_filter_pushdown(spark, feed_dir):
    df = (
        _registered(spark)
        .read.format("json_feed")
        .schema(SCHEMA)
        .load(feed_dir)
        .filter((F.col("lang") == "en") & F.col("score").isNotNull())
    )
    assert {r["id"] for r in df.collect()} == {1, 3}
    # Fully pushed: Spark removed the Filter operator above the scan —
    # the predicate runs inside the source's partition reader.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan json_feed" in plan
    assert "Filter" not in plan.replace("RuntimeFilters", "")


def test_feed_source_partial_pushdown_keeps_residual(spark, feed_dir):
    """A predicate the source can't evaluate (expression on a column)
    stays as a post-scan Filter while the pushable part is consumed."""
    df = (
        _registered(spark)
        .read.format("json_feed")
        .schema(SCHEMA)
        .load(feed_dir)
        .filter((F.col("lang") == "en") & (F.col("score") * 2 > 4.0))
    )
    assert {r["id"] for r in df.collect()} == {3}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan.replace("RuntimeFilters", "")


def test_feed_source_requires_schema(spark, feed_dir):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import AnalysisException

    with pytest.raises((Py4JJavaError, AnalysisException, Exception)):
        _registered(spark).read.format("json_feed").load(feed_dir).collect()


def test_json_feed_stream_across_drops(spark, tmp_path):
    """S8 streaming twin: the custom source consumes an append-only
    feed directory as micro-batches — state carries across drops, each
    file's records arrive exactly once."""
    import json as _json

    d = tmp_path / "feed_stream"
    d.mkdir()
    (d / "a_0001.json").write_text(_json.dumps(
        [{"id": 1, "name": "a", "v": 1.5}, {"id": 2, "name": "b", "v": 2.5}]
    ))

    from rds_glue_s3_etl_pipeline_spark.sources.feed_source import (
        register_feed_source,
    )

    register_feed_source(spark)
    stream = (
        spark.readStream.format("json_feed")
        .schema("id long, name string, v double")
        .load(str(d))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("feed_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_feed"))
        .start()
    )
    try:
        q.processAllAvailable()
        (d / "b_0002.json").write_text(_json.dumps(
            [{"id": 3, "name": "c", "v": 3.5}]
        ))
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    rows = {r["id"]: (r["name"], r["v"])
            for r in spark.table("feed_stream").collect()}
    assert rows == {1: ("a", 1.5), 2: ("b", 2.5), 3: ("c", 3.5)}


def test_json_feed_stream_replay_deterministic(tmp_path):
    """readBetweenOffsets must replay a committed range bit-identically
    after restart (the exactly-once contract), including when NEW files
    arrived after the range was committed."""
    import json as _json

    from pyspark.sql.types import StructType
    from rds_glue_s3_etl_pipeline_spark.sources.feed_source import (
        _JsonFeedStreamReader,
    )

    d = tmp_path / "feed_replay"
    d.mkdir()
    (d / "a.json").write_text(_json.dumps([{"id": 1, "name": "a", "v": 1.0}]))
    (d / "b.json").write_text(_json.dumps([{"id": 2, "name": "b", "v": 2.0}]))

    schema = StructType.fromDDL("id long, name string, v double")
    r = _JsonFeedStreamReader(schema, {"path": str(d)})
    assert r.initialOffset() == {"n_files": 0}
    rows, end = r.read({"n_files": 0})
    assert list(rows) == [(1, "a", 1.0), (2, "b", 2.0)]
    assert end == {"n_files": 2}
    # a later drop must NOT leak into the committed [0, 2) range
    (d / "c.json").write_text(_json.dumps([{"id": 3, "name": "c", "v": 3.0}]))
    replay = list(r.readBetweenOffsets({"n_files": 0}, {"n_files": 2}))
    assert replay == [(1, "a", 1.0), (2, "b", 2.0)]
    rows2, end2 = r.read({"n_files": 2})
    assert list(rows2) == [(3, "c", 3.0)] and end2 == {"n_files": 3}
