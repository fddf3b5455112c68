"""The measured dial behind _DBSCAN_NPROBE (round 12): truth eps-edge
recall and truth co-membership pair recall of the multi-probe edge
generator, per nprobe, per scale — the DBSCAN analogue of
knn_probe_dial.py.

For each nprobe the probe builds the mp eps-edge set (probe x home
candidates, eps filter, symmetric distinct), runs the shared DBSCAN
pipeline on it, and scores both against the unblocked truth arm
(all-pairs broadcast — fixture-protocol quadratic, same class as
q232). Precision needs no column: recovered edges are a subset of true
edges by construction, so mp components only refine truth components.

Usage: python tools/dbscan_mp_dial.py [--sf DIR ...] [--nprobe 1 2 3 4]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from rds_glue_s3_etl_pipeline_spark.catalog import load  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.functions import vector as V  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.operators.dbscan import (  # noqa: E402
    dbscan_from_edges,
)
from rds_glue_s3_etl_pipeline_spark.queries.vector6 import (  # noqa: E402
    _DBSCAN_EPS_COS,
    _DBSCAN_MIN_NBRS,
    _knn_assignments,
    _mp_eps_candidates,
    _mp_symmetrize,
)
from rds_glue_s3_etl_pipeline_spark.session import get_spark  # noqa: E402


def pairs_of(df):
    a = df.filter(F.col("cluster_id").isNotNull()).select(
        F.col("vec_id").alias("u"), F.col("cluster_id").alias("c")
    )
    b = a.select(F.col("u").alias("v"), "c")
    return a.join(b, "c").filter(F.col("u") < F.col("v")).select("u", "v")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", nargs="+", default=["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    )
    ap.add_argument("--nprobe", nargs="+", type=int, default=[1, 2, 3, 4, 5, 6])
    args = ap.parse_args()
    spark = get_spark("dbscan_mp_dial", cpus=32, shuffle_partitions=32)

    for sf in args.sf:
        e = load(spark, sf, "embeddings").select("vec_id", "embedding")
        ids = e.select("vec_id")
        a = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("a_v"))
        b = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("b_v"))
        true_und = (
            a.join(F.broadcast(b), F.col("a") < F.col("b"))
            .withColumn("cs", F.round(V.cosine(F.col("a_v"), F.col("b_v")), 4))
            .filter(F.col("cs") >= _DBSCAN_EPS_COS)
            .select("a", "b")
        ).cache()
        n_true = true_und.count()
        tsym = true_und.union(
            true_und.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        tpairs = pairs_of(dbscan_from_edges(ids, tsym, _DBSCAN_MIN_NBRS)).cache()
        n_tp = tpairs.count()
        for nprobe in args.nprobe:
            t0 = time.perf_counter()
            home, probe, block_cols = _knn_assignments(spark, sf, nprobe)
            sym = _mp_symmetrize(
                _mp_eps_candidates(probe, home, block_cols)
            ).cache()
            edge_hit = (
                sym.filter(F.col("a") < F.col("b")).join(true_und, ["a", "b"]).count()
            )
            dp = pairs_of(dbscan_from_edges(ids, sym, _DBSCAN_MIN_NBRS))
            pair_hit = tpairs.join(dp, ["u", "v"]).count()
            wall = time.perf_counter() - t0
            print(
                f"{sf} nprobe={nprobe}: edge_recall={edge_hit}/{n_true}"
                f"={edge_hit / max(n_true, 1):.3f} "
                f"pair_recall={pair_hit}/{n_tp}={pair_hit / max(n_tp, 1):.3f} "
                f"wall={wall:.1f}s",
                flush=True,
            )
            sym.unpersist()
        true_und.unpersist()
        tpairs.unpersist()


if __name__ == "__main__":
    main()
