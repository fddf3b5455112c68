"""Scale probe: does the engine hold when the data grows 10x?

Builds a key-offset replicated copy of sf0.1 (every fact table unioned
``--mult`` times with disjoint key ranges — a true Nx dataset, not the
same bytes rescanned: joins fan out, dedup finds the replica groups,
windows get Nx rows per partition), writes it once to
``.scale/sf<N>/``, then runs the bench headline against it and prints
the usual one-line JSON. Compare against the sf0.1 line: a healthy
operator scales ~linearly; anything superlinear is a shuffle/skew bug.

Usage:
  python tools/scale_probe.py            # build (if absent) + bench at 10x
  python tools/scale_probe.py --mult 5   # 5x instead
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rds_glue_s3_etl_pipeline_spark.catalog import TABLES, load  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.session import get_spark  # noqa: E402

# Per-table key columns that must stay globally unique across replicas.
# Join keys that must stay CONSISTENT across tables get the same offset
# (l_orderkey/o_orderkey). Foreign keys into un-replicated dimensions
# (custkey, nationkey, ...) are left alone: 10x facts per dimension row
# is exactly what a scale-up looks like.
KEY_OFFSET = 10_000_000
REPLICATE_KEYS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build(spark, src_dir: str, out_dir: str, mult: int) -> None:
    for name in TABLES:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        df = load(spark, src_dir, name)
        keys = REPLICATE_KEYS.get(name)
        if keys:
            replicas = F.broadcast(
                spark.range(mult).select(F.col("id").alias("__r"))
            )
            df = df.crossJoin(replicas)
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.col("__r") * KEY_OFFSET)
            df = df.drop("__r")
        df.write.mode("overwrite").parquet(dst)
        print(f"built {dst}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    sf = 0.1 * args.mult
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale",
        f"sf{sf}",
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("scale_probe_build", cpus=32, shuffle_partitions=32)
    build(spark, args.src, out_dir, args.mult)
    spark.stop()

    env = dict(os.environ, SPARK_GRAFT_SF_DIR=out_dir)
    subprocess.run([sys.executable, "bench.py"], env=env, check=True)


if __name__ == "__main__":
    main()
