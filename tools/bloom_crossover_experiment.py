"""Bloom probe vs exact semi-join, head to head (SCALE.md evidence).

Reproduces the two measurements behind the Bloom family's honest
contract in SCALE.md:

1. Fixture shape (default): the q198 decontamination split on the
   100x replica fixture — small eval key set, corpus-sized train
   side. Shows the broadcast LEFT SEMI winning at broadcastable eval
   sizes (the bitset's advantage is memory, not wall).
2. Synthetic crossover probe (--synthetic): N_EVAL md5 keys vs
   N_TRAIN rows with 10% membership. Shows the same ordering holds
   even at multi-million-key eval sets on local[32], BECAUSE
   single-JVM broadcast is a shared-memory no-op — the cluster cost
   the filter removes (shipping/hashing a multi-GB relation per
   executor) has no local analogue. What it does pin: probe and
   build throughput, both linear.

Usage:
  python tools/bloom_crossover_experiment.py [--sf DIR] [--synthetic]
    [--n-eval 4000000] [--n-train 40000000]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from bench import canary_sec  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.catalog import load  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.operators import bloom as B  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.session import get_spark  # noqa: E402


def best_of(f, reps: int = 3) -> float:
    f()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


def fixture_frames(spark, sf_dir: str):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("key"),
        (F.md5(F.col("doc_id").cast("string").cast("binary")) < F.lit("0a")).alias(
            "is_eval"
        ),
    )
    ev = docs.where("is_eval").select("key").distinct()
    train = docs.where(~F.col("is_eval")).select("doc_id", "key")
    return ev, train


def synthetic_frames(spark, n_eval: int, n_train: int):
    ev = spark.range(n_eval).select(
        F.md5(F.col("id").cast("string").cast("binary")).alias("key")
    )
    train = spark.range(n_train).select(
        F.md5(
            F.when(F.col("id") % 10 == 0, (F.col("id") / 10).cast("long"))
            .otherwise(F.col("id") + 1_000_000_000)
            .cast("string")
            .cast("binary")
        ).alias("key")
    )
    return ev, train


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.scale/sf10.0")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--n-eval", type=int, default=4_000_000)
    ap.add_argument("--n-train", type=int, default=40_000_000)
    args = ap.parse_args()

    spark = get_spark("bloom_crossover", cpus=32, shuffle_partitions=32)
    print("canary", round(min(canary_sec(spark), canary_sec(spark)), 3))

    if args.synthetic:
        ev, train = synthetic_frames(spark, args.n_eval, args.n_train)
    else:
        ev, train = fixture_frames(spark, args.sf)
    n_eval = ev.count()
    n_train = train.count()
    m = B.bloom_bits(n_eval)
    print(f"n_eval_keys={n_eval} n_train={n_train} m_bits={m} "
          f"bitset_MB={m / 8 / 1e6:.1f}")

    t0 = time.perf_counter()
    bits = B.bloom_build(ev, "key", m)
    print("build_s", round(time.perf_counter() - t0, 3))

    t_probe = best_of(
        lambda: B.bloom_probe(train, "key", bits, m).where("maybe_member").count()
    )
    t_bc = best_of(lambda: train.join(F.broadcast(ev), "key", "left_semi").count())
    t_sh = best_of(lambda: train.join(ev, "key", "left_semi").count())
    print(
        f"probe_s={t_probe:.3f} semi_broadcast_s={t_bc:.3f} "
        f"semi_shuffle_s={t_sh:.3f}"
    )
    print("canary", round(canary_sec(spark), 3))


if __name__ == "__main__":
    main()
