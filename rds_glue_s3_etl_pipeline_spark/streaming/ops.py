"""Structured Streaming operators over the ``events`` stream (SURVEY
§2.9 T1-T6 — all extension surface; the reference is a batch-only,
on-demand Glue job, ``main.tf:35-73``).

Design: each operator is ``stream_df -> stream_df`` so the same
transformations compose under ``readStream`` (incremental) and
``read`` (batch backfill) — the Spark unified-engine idiom. State
stores bound memory via watermarks; every aggregation here is
map-side-combinable before the stateful operator.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EVENT_COLS = "event_id long, {ts}, user_id long, event_type string, value double, props string"


def _ts_encoding_of(t) -> str:
    # TIMESTAMP(NANOS) and bare INT64 both surface as bigint under
    # nanosAsLong — the event feed's historical nanos convention.
    if str(t) == "int64" or getattr(t, "unit", None) == "ns":
        return "nanos"
    return "tz" if getattr(t, "tz", None) else "ntz"


def _event_ts_encoding(dir_path: str, sample_cap: int = 64) -> str:
    """Learn how ``ts`` is physically encoded from the parquet footers
    — the fixture generator has shipped TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS, isAdjustedToUTC=false) in different rounds, and a
    streaming source needs its schema declared before the first batch.

    A stream directory accumulating drops across fixture regenerations
    could hold MIXED encodings; one declared schema would then read the
    other files as garbage timestamps. So this checks every footer (up
    to ``sample_cap``, evenly spaced, always including first and last —
    drops land in filename order so a regeneration flip lands at an
    edge) and FAILS LOUDLY on a mix rather than mis-decoding. Footer
    reads only, on the driver; no data pages touched.
    Returns 'nanos' | 'ntz' | 'tz'."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(dir_path, "*.parquet")))
    if not files:
        return "ntz"  # current fixture encoding; harmless default
    if len(files) > sample_cap:
        step = (len(files) - 1) / (sample_cap - 1)
        files = [files[round(i * step)] for i in range(sample_cap)]
    encs = {
        f: _ts_encoding_of(pq.read_schema(f).field("ts").type) for f in files
    }
    distinct = set(encs.values())
    if len(distinct) > 1:
        examples = {e: next(f for f, fe in encs.items() if fe == e) for e in distinct}
        raise ValueError(
            f"mixed ts encodings in stream directory {dir_path}: {examples}; "
            "a stream directory must be encoding-uniform — split the drops "
            "by encoding (or re-encode) before reading"
        )
    return distinct.pop()


def read_event_stream(
    spark: SparkSession, dir_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based event stream (parquet drops). Applies the same ts
    normalization as catalog.load, so batch and streaming see the
    identical TimestampType column whatever the fixture encoding.

    At production scale the source would be Kafka with the identical
    downstream pipeline (swap this reader, keep every operator).
    """
    enc = _event_ts_encoding(dir_path)
    if enc == "nanos":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = _EVENT_COLS.format(ts="ts long")
    elif enc == "ntz":
        schema = _EVENT_COLS.format(ts="ts timestamp_ntz")
    else:
        schema = _EVENT_COLS.format(ts="ts timestamp")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(dir_path)
    if enc == "nanos":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if enc == "ntz":
        # Session tz is pinned UTC, so the cast preserves the instant.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """T1+T3: tumbling-window counts/sums with late-data watermark.
    Append-mode compatible: a window finalizes when the watermark
    passes its end, bounding state to (watermark/window) windows/key."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """T1 sliding variant: each event lands in window/slide windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """T2: per-user session windows (dynamic gap-based windows — the
    streaming twin of the batch lag/cumsum sessionization, q18)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def stateful_dedup(
    events: DataFrame, key: str = "event_id", watermark: str = "2 hours"
) -> DataFrame:
    """T4: exactly-once event delivery via watermarked dropDuplicates —
    state holds only keys younger than the watermark."""
    return events.withWatermark("ts", watermark).dropDuplicates([key, "ts"])


def stateful_dedup_within_watermark(
    events: DataFrame, key: str = "event_id", watermark: str = "2 hours"
) -> DataFrame:
    """T4, key-only variant: ``dropDuplicatesWithinWatermark`` dedupes
    on the KEY alone — replays with a *different* (late-arriving,
    re-stamped) event time still dedupe, which plain
    ``dropDuplicates([key, "ts"])`` cannot do without keeping every key
    forever. State expiry is still watermark-bounded: a key is
    remembered only while a duplicate could legally arrive, so the
    store stays O(keys-per-watermark-window) on an unbounded stream —
    the at-least-once-source to exactly-once-sink bridge.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        [key]
    )


def stream_static_join(events: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """T5: enrich a stream against a static dimension. Spark plans the
    static side as a broadcast per micro-batch — no stream state."""
    return events.join(F.broadcast(dim), on, "left")


def attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    join_type: str = "inner",
) -> DataFrame:
    """T7: stream-stream interval join — attribute each purchase to the
    view by the same user within ``horizon`` before it (the classic
    ad-attribution shape). Both sides are watermarked so Spark can
    expire join state: a buffered view is droppable once the purchase
    watermark passes view_ts + horizon. The join is equi on user_id
    plus a time-range predicate — state is hash-partitioned by user_id,
    no cross-partition scans.

    ``join_type="leftOuter"`` is the conversion-funnel variant: a view
    that attracts NO purchase within the horizon still emits (null
    purchase columns) once the watermark proves no match can arrive —
    the rows an unconverted-impressions report is made of. Outer rows
    materialize only at state expiry, so they trail the inner results
    by up to watermark + horizon (event time), by construction.
    """
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    ).withWatermark("view_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")),
        join_type,
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        "view_ts",
        "purchase_ts",
        "purchase_value",
    )


def _write_epoch_partition(batch_df: DataFrame, epoch_id: int, out_dir: str) -> None:
    """The per-epoch write used by ``idempotent_parquet_sink``'s
    foreachBatch handler: dynamic partition overwrite scoped to this
    epoch's ``__epoch`` partition. Module-level so restart/replay tests
    can invoke the exact production write path directly."""
    (
        batch_df.withColumn("__epoch", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__epoch")
        .parquet(out_dir)
    )


def idempotent_parquet_sink(
    stream: DataFrame, out_dir: str, checkpoint_dir: str, query_name: str = "files"
):
    """T6 file-sink variant with exactly-once file output: each
    micro-batch writes under an ``__epoch=<id>`` partition with DYNAMIC
    partition overwrite, so a replayed epoch (restart between write and
    checkpoint commit) rewrites exactly its own partition instead of
    appending duplicates. This is the standard idempotent-foreachBatch
    pattern for file targets that lack transactions.

    Readers use ``spark.read.parquet(out_dir)`` and simply drop
    ``__epoch``; compaction (sources/sinks.py:compact_parquet) folds
    the per-epoch directories once they stop being rewritable.
    """

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        _write_epoch_partition(batch_df, epoch_id, out_dir)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )


def notify_each_batch(
    stream: DataFrame,
    notify: Callable[[str], None],
    checkpoint_dir: str,
    query_name: str = "notify",
):
    """T6: the streaming analog of the reference's Slack sink (S5) —
    a foreachBatch sink that reports each micro-batch's row count,
    mirroring the success message of gule_test_job.py:213-215."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        n = batch_df.count()
        notify(f"batch {epoch_id}: {n} rows")

    return (
        stream.writeStream.outputMode("update")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )


def rocksdb_state_conf(changelog_checkpointing: bool = True) -> dict[str, str]:
    """Session confs for the RocksDB state store provider — the state
    backend a production-scale stateful stream runs on. The default
    HDFS-backed provider keeps every key IN EXECUTOR HEAP, so state
    size is capped by memory; RocksDB spills to local disk (state
    bounded by disk, not heap) and with changelog checkpointing
    uploads per-batch deltas instead of full snapshots.

    Apply at session build (the provider cannot change on a running
    query's checkpoint):

        get_spark(..., extra_conf=rocksdb_state_conf())

    Local tests default to the HDFS provider for speed; the contract
    tested in tests/test_streaming.py is that every stateful operator
    here (windowed aggs, dedup, applyInPandasWithState) runs
    identically on RocksDB.
    """
    conf = {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
    }
    if changelog_checkpointing:
        conf[
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        ] = "true"
    return conf
