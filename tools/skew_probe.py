"""Skew probe: measure salted_join vs the plain shuffled join under a
genuinely zipfian key — the measurement the fixtures can't provide
(their keys replicate uniformly, so q110's salting had never been
exercised against real skew).

Setup: a synthetic big table whose key distribution is deterministic
power-law (key 0 holds ~18% of all rows), joined to a small dim table.
Broadcast is disabled and AQE is OFF for both variants, isolating the
salting itself (AQE's skew-split is the automatic fix for sort-merge
joins; salting is the explicit fallback for the cases AQE can't reach,
see operators/skew.py). With 32 cores, an unsalted hot key serializes
its whole partition into one tail task; salting spreads it salt_n
ways — the wall-clock gap IS the tail-task time being probed.

Prints one JSON line:
  {"rows": N, "keys": K, "hot_key_share": ..., "unsalted_sec": ...,
   "salted_sec": ..., "speedup": ..., "checksum_match": true}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rds_glue_s3_etl_pipeline_spark.operators.skew import salted_join  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.session import get_spark  # noqa: E402

N_ROWS = 20_000_000
N_KEYS = 1_000
SALT_N = 32


def build_tables(spark):
    """Deterministic zipf-ish big table: u = uniform hash of id in
    [0,1); key = floor(K * u^4) concentrates mass at small keys —
    P(key=0) = (1/K)^(1/4) ≈ 0.178 at K=1000. No RNG state, fully
    reproducible."""
    u = (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) + 0.5) / 1_000_000.0
    big = spark.range(N_ROWS).select(
        F.floor(F.lit(N_KEYS) * F.pow(u, F.lit(4.0))).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    small = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 13).alias("w")
    )
    return big, small


def timed_join(spark, salted: bool) -> tuple[float, int]:
    big, small = build_tables(spark)
    if salted:
        joined = salted_join(big, small, on="k", how="inner", salt_n=SALT_N)
    else:
        joined = big.join(small, "k")
    agg = joined.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("chk")
    )
    t0 = time.perf_counter()
    row = agg.first()
    return time.perf_counter() - t0, (row["n"], row["chk"])


def main() -> None:
    spark = get_spark(
        "skew_probe",
        cpus=32,
        shuffle_partitions=32,
        extra_conf={
            # isolate the salting: no broadcast escape hatch, no AQE
            # skew-split doing the job for us
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    # warm codegen for both plan shapes
    timed_join(spark, salted=False)
    timed_join(spark, salted=True)

    unsalted = min(timed_join(spark, salted=False) for _ in range(2))
    salted = min(timed_join(spark, salted=True) for _ in range(2))

    hot_share = (
        build_tables(spark)[0].filter(F.col("k") == 0).count() / N_ROWS
    )
    print(
        json.dumps(
            {
                "rows": N_ROWS,
                "keys": N_KEYS,
                "salt_n": SALT_N,
                "hot_key_share": round(hot_share, 4),
                "unsalted_sec": round(unsalted[0], 3),
                "salted_sec": round(salted[0], 3),
                "speedup": round(unsalted[0] / salted[0], 2),
                "checksum_match": unsalted[1] == salted[1],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
