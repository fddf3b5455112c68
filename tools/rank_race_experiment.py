"""Global rank: unpartitioned window vs two-pass prefix sum
(SCALE.md evidence for the q203 scale-path claim).

The q203 curriculum bucketing uses a ROW_NUMBER() OVER (ORDER BY ...)
with no PARTITION BY so its bucketing policy stays oracle-pinned —
but that plan is a single task at any cluster size. This script races
it against operators/prefix.global_row_number (range partition →
per-partition counts → broadcast exclusive offsets) on N synthetic
rows, computing the identical 4-phase histogram both ways.

Measured 2026-08 on this box at N=20M: window 19.6s vs prefix 12.1s —
only 1.6x locally because a 20M-int in-memory sort is cheap and the
prefix path pays a localCheckpoint; on a cluster the gap is
categorical (one core vs all of them).

Usage: python tools/rank_race_experiment.py [--n 20000000]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import canary_sec  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.operators.prefix import (  # noqa: E402
    global_row_number,
)
from rds_glue_s3_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000_000)
    args = ap.parse_args()

    spark = get_spark("rank_race", cpus=32, shuffle_partitions=32)
    print("canary", round(min(canary_sec(spark), canary_sec(spark)), 3))
    base = spark.range(args.n).select(
        F.col("id").alias("doc_id"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("n_tok"),
    )

    def phases_window():
        r = base.select(
            F.row_number().over(Window.orderBy("n_tok", "doc_id")).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        return (
            r.select(F.expr("CAST((4*(rn-1)) DIV n AS BIGINT)").alias("phase"))
            .groupBy("phase")
            .count()
            .collect()
        )

    def phases_prefix():
        r = global_row_number(base, ["n_tok", "doc_id"], "rn")
        n = base.count()
        return (
            r.select(
                ((F.lit(4) * (F.col("rn") - 1)) / F.lit(n)).cast("long").alias("phase")
            )
            .groupBy("phase")
            .count()
            .collect()
        )

    def best_of(f, reps: int = 2) -> float:
        f()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            best = min(best, time.perf_counter() - t0)
        return best

    hw = {r["phase"]: r["count"] for r in phases_window()}
    hp = {r["phase"]: r["count"] for r in phases_prefix()}
    assert hw == hp, f"histograms diverge: {hw} vs {hp}"

    tw = best_of(phases_window)
    tp = best_of(phases_prefix)
    print(f"window_1part_s={tw:.3f} prefix_2pass_s={tp:.3f}")
    print("canary", round(canary_sec(spark), 3))


if __name__ == "__main__":
    main()
