"""Streaming state-store probe: replay ~1M synthetic events through
the stateful operators (T1 windowed agg, T4 watermark dedup) on the
RocksDB state store with changelog checkpointing, across many
micro-batches, and record how state grows per watermark setting.

This is the measurement behind the scale claim in streaming/ops.py's
rocksdb_state_conf docstring: with the default HDFS-backed provider,
state lives in executor HEAP (memory-bounded); RocksDB spills to local
disk, and the WATERMARK — not the corpus — bounds live state: a
tighter watermark evicts window/dedup state sooner, so steady-state
rows track (event rate x watermark), independent of total events
replayed. The probe replays the same event stream under a tight and a
loose watermark and prints per-operator state rows + bytes at the end
of the replay, plus batch counts, as one JSON line.

Run:  python tools/streaming_probe.py [--events 1000000 --batches 20]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rds_glue_s3_etl_pipeline_spark.session import get_spark  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.streaming.ops import (  # noqa: E402
    rocksdb_state_conf,
)


def write_event_files(spark, src_dir: str, n_events: int, n_files: int) -> None:
    """n_files parquet chunks of synthetic events with MONOTONE event
    time across files (file i covers its own time slice), so the file
    stream replays as an in-order stream and the watermark advances
    each batch — the condition under which eviction can happen at all."""
    per_file = n_events // n_files
    for i in range(n_files):
        (
            spark.range(per_file)
            .select(
                (F.lit(i) * per_file + F.col("id")).alias("event_id"),
                (F.col("id") % 50_000).alias("user_id"),
                # 1000 events/sec within each file's slice
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + F.lit(i) * (per_file // 1000)
                    + (F.col("id") / 1000).cast("long")
                ).alias("ts"),
                (F.pmod(F.xxhash64("id"), F.lit(1000)) / 10.0).alias("value"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(src_dir)
        )


def replay(spark, src_dir: str, watermark: str, n_files: int) -> dict:
    """Stream the files one per micro-batch through BOTH stateful
    shapes (tumbling window agg + dropDuplicatesWithinWatermark) and
    return the final state metrics from the progress stream."""
    schema = "event_id long, user_id long, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    wm = stream.withWatermark("ts", watermark)
    windowed = wm.groupBy(
        F.window("ts", "1 minute"), F.col("user_id") % 100
    ).agg(F.count(F.lit(1)).alias("n"))
    deduped = wm.dropDuplicatesWithinWatermark(["user_id"])

    chk = tempfile.mkdtemp(prefix="stream_probe_chk_")
    q1 = (
        windowed.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", os.path.join(chk, "win"))
        .start()
    )
    q2 = (
        deduped.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", os.path.join(chk, "dedup"))
        .start()
    )
    t0 = time.perf_counter()
    q1.processAllAvailable()
    q2.processAllAvailable()
    wall = time.perf_counter() - t0

    def state_of(q):
        prog = q.lastProgress
        ops = (prog or {}).get("stateOperators", [])
        return [
            {
                "operator": op.get("operatorName"),
                "rows_total": op.get("numRowsTotal"),
                "mem_bytes": op.get("memoryUsedBytes"),
                "rows_removed": op.get("numRowsRemoved"),
            }
            for op in ops
        ]

    out = {
        "watermark": watermark,
        "wall_sec": round(wall, 1),
        "batches": (q1.lastProgress or {}).get("batchId"),
        "window_state": state_of(q1),
        "dedup_state": state_of(q2),
    }
    q1.stop()
    q2.stop()
    shutil.rmtree(chk, ignore_errors=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--batches", type=int, default=20)
    args = ap.parse_args()

    spark = get_spark(
        "streaming_probe",
        cpus=8,
        shuffle_partitions=8,
        extra_conf=rocksdb_state_conf(changelog_checkpointing=True),
    )
    src = tempfile.mkdtemp(prefix="stream_probe_src_")
    write_event_files(spark, src, args.events, args.batches)

    results = [
        replay(spark, src, watermark, args.batches)
        for watermark in ("30 seconds", "30 minutes")
    ]
    shutil.rmtree(src, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "streaming_state_probe",
                "events": args.events,
                "batches": args.batches,
                "provider": "rocksdb+changelog",
                "runs": results,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
