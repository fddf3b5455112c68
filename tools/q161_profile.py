"""Per-phase wall-time breakdown of q161 (snapshot_stream_ingest) —
round-14 verdict item #5: the suite's slowest production-shaped query
(~16 s at sf0.1, stable across rounds, never profiled). Replays the
query body with perf_counter brackets around each phase and a timer
inside the foreachBatch fold, so >=90% of the wall is attributed.

Usage: python tools/q161_profile.py [--sf /root/testdata/sf0.1] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rds_glue_s3_etl_pipeline_spark.catalog import load  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.queries.corpus import (  # noqa: E402
    _SPLIT_MOD,
    _hashed_shingles,
    _incident_edges,
    _signatures,
    _staged_edges,
)
from rds_glue_s3_etl_pipeline_spark.scratch import scratch_dir  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.session import (  # noqa: E402
    get_spark,
    released_blocks,
)


def profile_once(spark, sf_dir: str) -> dict[str, float]:
    from rds_glue_s3_etl_pipeline_spark.operators.corpus_snapshot import (
        build_snapshot,
        read_snapshot_assigned,
        refresh_snapshot,
        survivors,
    )

    t: dict[str, float] = {}

    def mark(key: str, t0: float) -> float:
        now = time.perf_counter()
        t[key] = t.get(key, 0.0) + (now - t0)
        return now

    snapshot_dir = scratch_dir("q161p_snapshot_")
    with released_blocks(spark):
        t0 = time.perf_counter()
        docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
        is_new = F.col("doc_id") % _SPLIT_MOD == 0
        sh = _hashed_shingles(spark, sf_dir)  # eager localCheckpoint
        t0 = mark("1_shingles_checkpoint", t0)
        sig = _signatures(sh)  # eager localCheckpoint
        t0 = mark("2_signatures_checkpoint", t0)

        build_snapshot(
            docs.filter(~is_new),
            _staged_edges(
                sh.filter(F.col("doc_id") % _SPLIT_MOD != 0),
                sig=sig.filter(F.col("doc_id") % _SPLIT_MOD != 0),
            ),
            snapshot_dir,
            epoch_id=0,
        )
        t0 = mark("3_build_epoch0", t0)

        feed_dir = scratch_dir("q161p_feed_")
        new_docs = docs.filter(is_new)
        (
            new_docs.withColumn(
                "batch",
                F.concat(F.lit("batch_"), ((F.col("doc_id") % 15) / 5).cast("int")),
            )
            .repartition("batch")
            .write.mode("overwrite")
            .partitionBy("batch")
            .parquet(feed_dir)
        )
        t0 = mark("4_feed_write", t0)

        def fold(batch_df, epoch_id):
            f0 = time.perf_counter()
            target = int(epoch_id) + 1
            base = read_snapshot_assigned(spark, snapshot_dir, before_epoch=target)
            batch_ids = batch_df.select("doc_id")
            seen_or_batch = base.select("doc_id").union(batch_ids)
            sig_seen = sig.join(seen_or_batch, "doc_id", "left_semi")
            # materialize the incident edges HERE so the banding +
            # exact-verify cost separates from the CC/write cost
            # (refresh_snapshot's own localCheckpoint of an already-
            # checkpointed frame is a cheap block copy)
            inc = _incident_edges(sh, batch_ids, sig=sig_seen).localCheckpoint(
                eager=True
            )
            f0 = mark(f"5a_fold{target}_incident_edges", f0)
            refresh_snapshot(
                spark,
                snapshot_dir,
                batch_df.select("doc_id", "n_chars"),
                inc,
                epoch_id=target,
            )
            mark(f"5b_fold{target}_cc_write", f0)

        stream = (
            spark.readStream.schema("doc_id long, n_chars long")
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(feed_dir, "batch=batch_*"))
        )
        chk = scratch_dir("q161p_chk_")
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(fold)
            .option("checkpointLocation", chk)
            .start()
        )
        try:
            t0 = time.perf_counter()
            q.processAllAvailable()
            total_stream = time.perf_counter() - t0
        finally:
            q.stop()
        folds = sum(v for k, v in t.items() if k.startswith("5"))
        t["6_stream_overhead"] = total_stream - folds
    t0 = time.perf_counter()
    n = survivors(read_snapshot_assigned(spark, snapshot_dir)).count()
    mark("7_survivors_read", t0)
    t["_survivor_rows"] = float(n)
    return t


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    spark = get_spark("q161_profile", cpus=32, shuffle_partitions=32)
    runs = []
    for i in range(args.reps + 1):  # rep 0 = warm-up, discarded
        t = profile_once(spark, args.sf)
        total = sum(v for k, v in t.items() if not k.startswith("_"))
        t["_total"] = round(total, 3)
        if i:
            runs.append(t)
        print(
            f"rep{i}{' (warm-up, discarded)' if i == 0 else ''}: "
            + json.dumps({k: round(v, 3) for k, v in sorted(t.items())}),
            flush=True,
        )
    best = {
        k: round(min(r[k] for r in runs), 3)
        for k in runs[0]
        if not k.startswith("_")
    }
    best["_total_best_phase_sum"] = round(sum(best.values()), 3)
    print("BEST-OF per phase: " + json.dumps(dict(sorted(best.items()))))


if __name__ == "__main__":
    main()
