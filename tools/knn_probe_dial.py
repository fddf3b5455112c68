"""Tabulate the k-NN graph's (recall, cost) curve over the multi-probe
dial — the round-11 measurement behind the q214 operating point and
the restored gate floors (round-10 verdict item #1).

For each (scale, nprobe): candidates from the depth-scaled probe rule
(_knn_assignments — nprobe blocks at depth 1, best nprobe² deepest
blocks from nprobe parent cells at depth ≥ 2), recall@3 against exact
brute force on the deterministic 64-query md5 sample, wall seconds.

Usage: python tools/knn_probe_dial.py [--sfs sf0.01,sf0.1] [--nprobes 1,2,3,4]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from rds_glue_s3_etl_pipeline_spark.catalog import load  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.functions import vector as V  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.queries.vector6 import (  # noqa: E402
    _KNN_K,
    _KNN_SAMPLE,
    _knn_candidates,
)
from rds_glue_s3_etl_pipeline_spark.session import get_spark  # noqa: E402


def exact_sample(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = (
        e.orderBy(
            F.md5(F.col("vec_id").cast("string").cast("binary")), F.col("vec_id")
        )
        .limit(_KNN_SAMPLE)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_v"))
    )
    scored = e.join(F.broadcast(qs), F.col("vec_id") != F.col("q_id")).select(
        "q_id",
        F.col("vec_id").alias("nbr_id"),
        F.round(V.cosine(F.col("q_v"), F.col("embedding")), 4).alias("cs"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cs"), F.asc("nbr_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _KNN_K)
        .select("q_id", "nbr_id")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default="sf0.01,sf0.1")
    ap.add_argument("--nprobes", default="1,2,3,4")
    ap.add_argument("--root", default="/root/testdata")
    args = ap.parse_args()

    spark = get_spark("knn_probe_dial", cpus=16)
    print(f"{'scale':8s} {'nprobe':>6s} {'cand':>9s} {'recall@3':>9s} {'sec':>6s}")
    for sf in args.sfs.split(","):
        sf_dir = f"{args.root}/{sf}"
        exact = exact_sample(spark, sf_dir).localCheckpoint(eager=True)
        n_q = exact.select("q_id").distinct().count()
        for npb in [int(x) for x in args.nprobes.split(",")]:
            t0 = time.perf_counter()
            cand = _knn_candidates(spark, sf_dir, npb)
            n_cand = cand.count()
            scored = cand.select(
                F.col("a_id").alias("vec_id"),
                "nbr_id",
                F.round(V.cosine(F.col("a_v"), F.col("b_v")), 4).alias("cs"),
            )
            w = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("nbr_id"))
            g = (
                scored.withColumn("rnk", F.row_number().over(w))
                .filter(F.col("rnk") <= _KNN_K)
                .select(
                    F.col("vec_id").alias("b_vid"), F.col("nbr_id").alias("b_nid")
                )
            )
            hits = exact.join(
                g,
                (F.col("b_vid") == F.col("q_id"))
                & (F.col("b_nid") == F.col("nbr_id")),
                "left_semi",
            ).count()
            took = time.perf_counter() - t0
            print(
                f"{sf:8s} {npb:6d} {n_cand:9d} "
                f"{hits / (n_q * _KNN_K):9.3f} {took:6.1f}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
