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
            if name == "embeddings":
                # Per-replica SIGNED ROTATION — an orthogonal transform
                # (rotate components by r mod dim, then flip signs by
                # hash(r, i)): within-replica cosines are EXACTLY
                # preserved (orthogonality), cross-replica similarity
                # collapses to ~0, so true near-dup pairs grow linearly
                # with mult. Identical replicas would give every vector
                # mult-1 perfect clones — C(mult,2) true pairs per
                # group in ANY blocking scheme, a fixture artifact that
                # swamps the blocking comparison (observed: q149 and
                # q162 indistinguishable at 100× because clone-pair CC
                # dominated both).
                dim = 64
                v = F.col("embedding")
                s = (F.col("__r") % dim).cast("int")
                rotated = F.concat(
                    F.slice(v, s + F.lit(1), F.lit(dim) - s),
                    F.slice(v, F.lit(1), s),
                )
                flipped = F.transform(
                    rotated,
                    lambda x, i: x
                    * (F.pmod(F.xxhash64(F.col("__r"), i), F.lit(2)) * 2 - 1),
                )
                df = df.withColumn(
                    "embedding",
                    F.when(F.col("__r") == 0, v).otherwise(flipped),
                )
            if name == "documents":
                # Injective per-replica word renaming (replica 0 keeps
                # the original text): within-replica Jaccard structure
                # is EXACTLY preserved (shingles match iff the original
                # shingles matched), while cross-replica similarity
                # drops to zero (every word differs). Near-dup pairs
                # therefore grow LINEARLY with mult — the shape of a
                # real corpus scale-up. Identical replicas would make
                # every doc a member of a mult-sized clone group and
                # inflate pair counts by mult², measuring a fixture
                # artifact instead of the operator.
                df = df.withColumn(
                    "text",
                    F.when(F.col("__r") == 0, F.col("text")).otherwise(
                        F.concat_ws(
                            " ",
                            F.transform(
                                F.split(F.trim("text"), r"\s+"),
                                lambda w: F.concat(
                                    F.lit("r"),
                                    F.col("__r").cast("string"),
                                    F.lit("x"),
                                    w,
                                ),
                            ),
                        )
                    ),
                )
            df = df.drop("__r")
        df.write.mode("overwrite").parquet(dst)
        print(f"built {dst}", flush=True)


def run_queries(out_dir: str, names: list[str], mult: int) -> None:
    """Bounded in-process sweep: time ONLY the named registry queries
    against the replica fixture (best-of-2, canary-bracketed, same
    session shape as bench.py) and print one JSON line. This is how
    the 100x decade is probed — the full headline at 100x would take
    hours; the staged dedup/ANN/graph family is where the scaling
    argument lives."""
    import json
    import time

    from bench import canary_sec, materialize
    from rds_glue_s3_etl_pipeline_spark.queries import REGISTRY

    spark = get_spark("scale_probe_bench", cpus=32, shuffle_partitions=32)
    canary = canary_sec(spark)
    canary = min(canary_sec(spark), canary)
    timings: dict[str, float | str] = {}
    for name in names:
        fn = REGISTRY[name].fn
        try:
            materialize(fn(spark, out_dir))  # warm codegen + page cache
        except Exception as e:
            timings[name] = f"err: {type(e).__name__}: {e}"[:300]
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(fn(spark, out_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    canary = min(canary, canary_sec(spark))
    total = round(sum(v for v in timings.values() if isinstance(v, float)), 3)
    print(
        json.dumps(
            {
                "metric": "scale_probe_subset_runtime",
                "value": total,
                "unit": "sec",
                "mult": mult,
                "queries": timings,
                "canary_sec": round(canary, 3),
            }
        ),
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--queries",
        nargs="*",
        default=None,
        help="bounded sweep: time only these registry queries in-process "
        "instead of subprocessing the full bench headline",
    )
    ap.add_argument(
        "--build-only", action="store_true", help="build the fixture and exit"
    )
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
    if args.build_only:
        return

    if args.queries:
        run_queries(out_dir, args.queries, args.mult)
        return

    env = dict(os.environ, SPARK_GRAFT_SF_DIR=out_dir)
    subprocess.run([sys.executable, "bench.py"], env=env, check=True)


if __name__ == "__main__":
    main()
