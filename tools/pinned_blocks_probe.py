"""Service-session residue probe for the vector6 (ANN/k-NN/DBSCAN)
family — round-9 verdict item #7.

Round 9 root-caused the q33 bench anomaly to SESSION RESIDUE: eager
localCheckpoint blocks pinned in the unified memory pool outlive the
query that made them, and the next memory-hungry job pays an eviction
storm. The fix (session.released_blocks) was only applicable to
queries whose results are terminal (parquet/collect) — the vector6
family returned DataFrames with LIVE lineage into pinned training
blocks, so a long-lived service session could not release them.

Round 10 made the family's shared state a persisted parquet artifact
(queries/vector6._knn_index): training checkpoints release at build
time, consumers read files. This probe runs every family query in ONE
shared session the way a service would (build → materialize → scoped
release) and asserts ZERO pinned RDD blocks after each query
completes. It also prints per-query wall time — the first query pays
the one-time index build; the rest ride the artifact.

Usage: python tools/pinned_blocks_probe.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from rds_glue_s3_etl_pipeline_spark.queries import REGISTRY  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.session import (  # noqa: E402
    get_spark,
    released_blocks,
)

FAMILY = [
    # prefix family (operators/prefix.py): round-10 ADVICE flagged the
    # _ranged localCheckpoint as reintroducing the residue class via
    # q230; round 11 moved the pin to parquet_checkpoint — these five
    # cover every prefix entry point (global/grouped row_number,
    # running sum via q75/q130, and q173's ranked-table consumer).
    "q45_ordered_projection",
    "q75_global_running_revenue",
    "q130_token_shards",
    "q173_quality_calibration",
    "q230_stratified_split_prefix",
    "q212_knn_graph_blocked",
    "q213_knn_recall_gate",
    "q214_knn_multiprobe_gate",
    "q215_label_propagation_audit",
    "q219_dbscan_embeddings",
    "q221_hard_negatives",
    "q223_dbscan_grid",
    "q224_leakage_safe_split_grid",
    "q225_knn_graph_incremental",
    "q228_dbscan_grid_incremental",
    "q229_dbscan_agreement_gate",
    # round-12 truth/lifecycle additions: q232/q233 build the truth arm
    # live, q234 parquet_checkpoints it, q235 is the broadcast-sample
    # pre-flight, q236 persists the frozen-codebook epoch artifact.
    "q232_dbscan_truth",
    "q233_dbscan_truth_gate",
    "q234_split_leakage_truth",
    "q235_eps_percolation_guard",
    "q236_knn_index_refresh",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_spark("pinned_blocks_probe")
    jsc = spark.sparkContext._jsc
    failures = 0
    for name in FAMILY:
        t0 = time.perf_counter()
        with released_blocks(spark):
            n = REGISTRY[name].fn(spark, args.sf).count()
        took = time.perf_counter() - t0
        pinned = len(jsc.getPersistentRDDs().keySet().toArray())
        status = "ok" if pinned == 0 else "PINNED"
        if pinned:
            failures += 1
        print(f"{status:6s} {name:34s} rows={n:<7d} {took:6.2f}s pinned_rdds={pinned}")
    print("PASS: no pinned blocks after any family query" if not failures
          else f"FAIL: {failures} queries left pinned blocks")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
