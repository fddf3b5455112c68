"""(grid, probes, recall, candidates) — the measured dial table for
the corpus-adaptive tree probe (queries/vector5.py).

Round 7's cells experiment showed: scale k with the corpus and
candidates drop ÷9.9, but matches fall to 64% if the probe count stays
fixed. This tool completes that measurement: against the EXACT
label-blocked best match (q132's shape) on a SAMPLE of the new batch,
it sweeps the flat codebook's nprobe dial and the adaptive tree's
(p0, p_sub) branching, recording per config

  candidates (pre-threshold scored pairs — the quadratic-or-not term),
  match recovery (found / exact) and identical-best fidelity,
  wall seconds (build + probe for that config).

The flat16 rows calibrate: nprobe=16 probes every cell, so its
recovery is 1.0 by construction and its candidate count is the exact
join's. Results land in SCALE.md next to the fixed-grid law table.

Usage:
  python tools/ann_adaptive_probe.py --sf .scale/sf1.0 [--sample-mod 10]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from rds_glue_s3_etl_pipeline_spark.catalog import load  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.functions import vector as V  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.queries.vector import (  # noqa: E402
    _NEAR_DUP_THRESHOLD,
)
from rds_glue_s3_etl_pipeline_spark.queries.vector5 import (  # noqa: E402
    _tree_probe_scored,
    best_match_per_new,
)
from rds_glue_s3_etl_pipeline_spark.session import get_spark  # noqa: E402


def exact_best(spark, sf_dir, sample_pred):
    """Ground truth: q132's exact label-blocked best match, restricted
    to the sampled query set."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    new = (
        e.filter((F.col("vec_id") % 5 == 0) & sample_pred)
        .withColumn("nrm", V.norm(F.col("embedding")))
        .alias("n")
    )
    hist = (
        e.filter(F.col("vec_id") % 5 != 0)
        .withColumn("nrm", V.norm(F.col("embedding")))
        .alias("h")
    )
    cos = F.round(
        V.dot(F.col("n.embedding"), F.col("h.embedding"))
        / (F.col("n.nrm") * F.col("h.nrm")),
        4,
    )
    scored = new.join(hist, F.col("n.label") == F.col("h.label")).select(
        F.col("n.vec_id").alias("new_vec_id"),
        F.col("h.vec_id").alias("hist_vec_id"),
        F.col("n.label").cast("long").alias("label"),
        cos.alias("cos_sim"),
    )
    n_cand = scored.count()
    w = Window.partitionBy("new_vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("hist_vec_id").asc()
    )
    best = (
        scored.filter(F.col("cos_sim") >= _NEAR_DUP_THRESHOLD)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("new_vec_id", F.col("hist_vec_id").alias("best_hist_vec_id"))
    )
    return best, n_cand


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".scale/sf1.0")
    ap.add_argument(
        "--sample-mod", type=int, default=10,
        help="query sample = new vecs with vec_id %% (5*mod) == 0",
    )
    args = ap.parse_args()

    spark = get_spark("ann_adaptive_probe", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    sample_pred = F.col("vec_id") % (5 * args.sample_mod) == 0

    n_rows = load(spark, args.sf, "embeddings").count()
    t0 = time.perf_counter()
    ex_best, ex_cand = exact_best(spark, args.sf, sample_pred)
    ex = {r["new_vec_id"]: r["best_hist_vec_id"] for r in ex_best.collect()}
    exact_sec = time.perf_counter() - t0

    flat_target = math.ceil(n_rows / 16)  # adaptive_grid -> flat k=16
    configs = [
        ("flat16_np4", flat_target, 4, 2),    # q150's pinned dials
        ("flat16_np8", flat_target, 8, 2),
        ("flat16_np16", flat_target, 16, 2),  # probes every cell: recovery 1.0
        ("tree32_p4x1", 32, 4, 1),
        ("tree32_p4x2", 32, 4, 2),            # q164's registered dials
        ("tree32_p4x4", 32, 4, 4),
        ("tree32_p8x2", 32, 8, 2),
    ]
    rows = []
    for label, target, p0, p_sub in configs:
        t0 = time.perf_counter()
        scored, ks = _tree_probe_scored(
            spark, args.sf, target, p0=p0, p_sub=p_sub, query_pred=sample_pred
        )
        n_cand = scored.count()
        got = {
            r["new_vec_id"]: r["best_hist_vec_id"]
            for r in best_match_per_new(scored).collect()
        }
        wall = time.perf_counter() - t0
        common = set(got) & set(ex)
        rows.append(
            {
                "config": label,
                "grid": ks,
                "p0": p0,
                "p_sub": p_sub,
                "probed_leaves": p0 * (p_sub ** max(len(ks) - 1, 0)),
                "total_blocks": math.prod(ks),
                "candidates": n_cand,
                "n_matches": len(got),
                "recovery": round(len(common) / max(len(ex), 1), 3),
                "same_best": sum(1 for v in common if got[v] == ex[v]),
                "wall_sec": round(wall, 1),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    print(
        json.dumps(
            {
                "metric": "ann_adaptive_probe",
                "sf": args.sf,
                "n_rows": n_rows,
                "exact": {
                    "n_matches": len(ex),
                    "candidates": ex_cand,
                    "wall_sec": round(exact_sec, 1),
                },
                "rows": rows,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
