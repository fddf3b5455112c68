"""Dimension-scaling law of the two Gram forms (round-8 verdict item
#5's measurement half): the decimal-exact explode (gram_exact, q195's
oracle anchor) does d*(d+1)/2 product ROWS per vector, the Arrow/BLAS
moments pass (operators/spectral.moments) does one X^T X per batch —
O(d^2) work inside BLAS but O(1) rows per partial. The sweep times
both at d in {64, 256, 512} over synthetic vectors (deterministic
xxhash-derived components, no RNG) and prints one JSON line per d.

Expected shape: explode wall grows ~d^2 (row fan-out), BLAS wall grows
far slower (memory-bandwidth-bound matmul over Arrow batches), which
is the argument for registering q209's agreement gate: the fast form
is the d=512+ path, the decimal form is the auditor.

Usage:
  python tools/moments_dsweep.py [--rows 50000] [--dims 64,256,512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rds_glue_s3_etl_pipeline_spark.operators import spectral as S  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.session import get_spark  # noqa: E402


def synthetic_vectors(spark, n_rows: int, d: int):
    """n_rows vectors of dimension d with components in [-1, 1],
    derived from xxhash64(vec_id, dim) — deterministic, no RNG, built
    JVM-side so the sweep measures the Gram forms, not data generation."""
    return spark.range(n_rows).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(20001)) - 10000)
            / F.lit(10000.0),
        ).alias("embedding"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50_000)
    ap.add_argument("--dims", default="64,256,512")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()
    dims = [int(x) for x in args.dims.split(",")]
    spark = get_spark("moments_dsweep", cpus=32, shuffle_partitions=32)

    for d in dims:
        vecs = synthetic_vectors(spark, args.rows, d).localCheckpoint(eager=True)
        blas = exact = float("inf")
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            g, s, n = S.moments(vecs, "embedding")
            blas = min(blas, time.perf_counter() - t0)
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            S.gram_exact(vecs, "embedding").count()
            exact = min(exact, time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "d": d,
                    "rows": args.rows,
                    "blas_moments_sec": round(blas, 2),
                    "exact_gram_sec": round(exact, 2),
                    "exact_over_blas": round(exact / blas, 1),
                }
            ),
            flush=True,
        )
        vecs.unpersist()


if __name__ == "__main__":
    main()
