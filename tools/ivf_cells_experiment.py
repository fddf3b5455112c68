"""Cells-∝-corpus experiment: demonstrate that q150's superlinear 100×
row in SCALE.md is the FIXED cell count, not the algorithm.

q150 probes nprobe=4 of k=16 trained cells; with k fixed, cell
population grows linearly with the corpus, so new×candidate pairs grow
quadratically — the 100× probe measured 31× on 10× data (10×→100×
decade). The production rule is k ∝ corpus / target-cell-size. This
experiment runs the same pipeline shape (train → assign → multi-probe
→ within-label best match) on the SAME fixture at two codebook sizes
and prints wall + candidate volume + matches for each:

  python tools/ivf_cells_experiment.py --sf .scale/sf10.0 --ks 16 160

With k=160 at 100× the cell size matches k=16 at 10× — if the wall
time returns to ~the 10× number, the quadratic term was the grid, not
the probe. Results recorded in SCALE.md round-7 section.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from rds_glue_s3_etl_pipeline_spark.catalog import load  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.functions import vector as V  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.operators.similarity import (  # noqa: E402
    kmeans_assign,
    spherical_kmeans_codebook,
)
from rds_glue_s3_etl_pipeline_spark.queries.vector3 import (  # noqa: E402
    _init_centroids,
    _KM_ITERS,
    _NPROBE,
)
from rds_glue_s3_etl_pipeline_spark.queries.vector import (  # noqa: E402
    _NEAR_DUP_THRESHOLD,
)
from rds_glue_s3_etl_pipeline_spark.session import get_spark  # noqa: E402


def run(spark, sf_dir: str, k: int) -> dict:
    e = load(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    ev = e.select("vec_id", "embedding")
    t0 = time.perf_counter()
    cent = spherical_kmeans_codebook(
        ev, _init_centroids(ev, k=k), iters=_KM_ITERS
    )
    fin = (
        kmeans_assign(ev, cent)
        .select("vec_id", "c_id", "embedding")
        .localCheckpoint(eager=True)
    )
    train_sec = time.perf_counter() - t0
    el = fin.join(e.select("vec_id", "label"), "vec_id").withColumn(
        "nrm", V.norm(F.col("embedding"))
    )
    w_probe = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.asc("c_id"))
    probe = (
        ev.filter(F.col("vec_id") % 5 == 0)
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "c_id",
            F.round(V.cosine(F.col("embedding"), F.col("cv")), 4).alias("c_cos"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= _NPROBE)
        .select(F.col("vec_id").alias("p_vec"), F.col("c_id").alias("p_cell"))
    )
    new = el.filter(F.col("vec_id") % 5 == 0).alias("n")
    hist = el.filter(F.col("vec_id") % 5 != 0).alias("h")
    cos = F.round(
        V.dot(F.col("n.embedding"), F.col("h.embedding"))
        / (F.col("n.nrm") * F.col("h.nrm")),
        4,
    )
    scored = (
        probe.join(hist, F.col("p_cell") == F.col("h.c_id"))
        .join(
            new,
            (F.col("n.vec_id") == F.col("p_vec"))
            & (F.col("n.label") == F.col("h.label")),
        )
        .select(
            F.col("n.vec_id").alias("new_vec_id"),
            F.col("h.vec_id").alias("hist_vec_id"),
            cos.alias("cos_sim"),
        )
    )
    t0 = time.perf_counter()
    n_candidates = scored.count()
    w = Window.partitionBy("new_vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("hist_vec_id").asc()
    )
    matches = (
        scored.filter(F.col("cos_sim") >= _NEAR_DUP_THRESHOLD)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .count()
    )
    probe_sec = time.perf_counter() - t0
    return {
        "k": k,
        "train_sec": round(train_sec, 1),
        "probe_sec": round(probe_sec, 1),
        "candidates": n_candidates,
        "matches": matches,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".scale/sf10.0")
    ap.add_argument("--ks", nargs="+", type=int, default=[16, 160])
    args = ap.parse_args()
    spark = get_spark("ivf_cells_exp", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out = [run(spark, args.sf, k) for k in args.ks]
    print(json.dumps({"sf": args.sf, "nprobe": _NPROBE, "runs": out}), flush=True)


if __name__ == "__main__":
    main()
