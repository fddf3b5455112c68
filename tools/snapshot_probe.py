"""Snapshot lifecycle probe: the PRODUCTION refresh shape — a SMALL
batch against a LARGE history — measured directly, plus the write
volume of delta-encoded epochs vs full-state epochs.

The per-round 100x table (SCALE.md) times q159, which refreshes 20% of
the corpus at once; the claim that refresh work is proportional to the
BATCH (queries/corpus.py) needs a small-batch measurement: here the
batch is doc_id % batch_mod == 0 (1% by default) and history is the
rest. For the same refresh we record:

- build wall (one-time history clustering),
- refresh wall in full mode (rewrites the whole assignment) and in
  delta mode (writes only the batch's blast radius),
- rows + parquet bytes written per epoch in both modes — the measured
  write-volume ratio that justifies delta encoding at scale.

Usage:
  python tools/snapshot_probe.py --sf /root/testdata/sf0.1 [--batch-mod 100]
  python tools/snapshot_probe.py --sf .scale/sf1.0 ...
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
from rds_glue_s3_etl_pipeline_spark.operators.corpus_snapshot import (  # noqa: E402
    build_snapshot,
    read_snapshot_assigned,
    refresh_snapshot,
    survivors,
)
from rds_glue_s3_etl_pipeline_spark.queries.corpus import (  # noqa: E402
    _hashed_shingles,
    _incident_edges,
    _staged_edges,
)
from rds_glue_s3_etl_pipeline_spark.scratch import scratch_dir  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.session import get_spark  # noqa: E402


def _epoch_stats(spark, out: str, epoch: int) -> dict:
    rows = (
        spark.read.parquet(out).filter(F.col("__epoch") == epoch).count()
    )
    part = os.path.join(out, f"__epoch={epoch}")
    nbytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(part)
        for f in fs
    )
    return {"rows": rows, "bytes": nbytes}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--batch-mod", type=int, default=100,
        help="batch = doc_id %% batch_mod == 0 (100 -> a 1%% batch)",
    )
    args = ap.parse_args()

    spark = get_spark("snapshot_probe", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, args.sf, "documents").select("doc_id", "n_chars")
    is_new = F.col("doc_id") % args.batch_mod == 0
    n_total = docs.count()
    n_batch = docs.filter(is_new).count()
    sh = _hashed_shingles(spark, args.sf)
    sh_hist = sh.filter(F.col("doc_id") % args.batch_mod != 0)
    new_ids = docs.filter(is_new).select("doc_id")

    out: dict = {
        "metric": "snapshot_refresh_probe",
        "sf": args.sf,
        "n_docs": n_total,
        "n_batch": n_batch,
        "modes": {},
    }
    # history edges built once per store (identical work; timed once)
    for mode in ("full", "delta"):
        store = scratch_dir(f"snapprobe_{mode}_")
        t0 = time.perf_counter()
        build_snapshot(
            docs.filter(~is_new), _staged_edges(sh_hist), store, epoch_id=0
        )
        build_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        refresh_snapshot(
            spark, store, docs.filter(is_new),
            _incident_edges(sh, new_ids), epoch_id=1, mode=mode,
        )
        refresh_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_surv = survivors(read_snapshot_assigned(spark, store)).count()
        read_sec = time.perf_counter() - t0
        out["modes"][mode] = {
            "build_sec": round(build_sec, 2),
            "refresh_sec": round(refresh_sec, 2),
            "read_survivors_sec": round(read_sec, 2),
            "n_survivors": n_surv,
            "epoch0": _epoch_stats(spark, store, 0),
            "epoch1": _epoch_stats(spark, store, 1),
        }
    f_ep1 = out["modes"]["full"]["epoch1"]
    d_ep1 = out["modes"]["delta"]["epoch1"]
    out["write_volume_ratio_full_over_delta"] = round(
        f_ep1["bytes"] / max(d_ep1["bytes"], 1), 2
    )
    assert (
        out["modes"]["full"]["n_survivors"] == out["modes"]["delta"]["n_survivors"]
    ), "delta-mode survivors diverged from full-mode"
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
