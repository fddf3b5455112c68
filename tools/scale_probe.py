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


def build_clustered(
    spark,
    src_dir: str,
    replica_dir: str,
    out_dir: str,
    mult: int,
    k: int = 64,
    dim: int = 128,
) -> None:
    """Clustered 10x corpus (round-14 verdict item #2): the replicated
    embeddings are near-orthogonal noise — no cluster structure — so
    the 10x quality gates SATURATE (q214 recall plateaued at 0.4427,
    margin 0.06) instead of demonstrating headroom. This builds a
    seeded mixture-of-Gaussians embedding table shaped like production
    data: ``k`` near-orthogonal centers, each vector = its center +
    sigma_c * iid hash-gaussian noise (Box-Muller over xxhash64
    uniforms — fully deterministic, no RNG state, reproducible on any
    engine).

    Geometry (empirically checked — the naive version percolated):
    - ``dim=128`` with JITTERED ONE-HOT centers (axis e_c, hash sign,
      + 0.01 gaussian jitter, normalized), NOT random directions:
      random centers in dim=64 have pairwise-cos tails to ~0.5 over
      C(64,2) pairs, and unrelated POINTS have cos std ~1/sqrt(dim) —
      over the 2x10^8 cross pairs of a 20k corpus the >=6-sigma tail
      crosses eps=0.4 thousands of times and the eps-graph percolates
      (measured: largest CC 276 of 500 at dim=64/random centers; a
      0.08 jitter — norm 0.9 in 128 dims, half the center mass —
      re-created center-pair cosines to 0.45 and merged ~8 clusters).
      At dim=128 the cross-pair std is ~0.06-0.074 and 0.4 sits at
      >=5.5 sigma of every cross-pair class: expected bridge count
      < 1 corpus-wide.
    - PER-CENTER sigma (the verdict's dial): 75% tight (0.055 —
      within-cluster cos ~0.72, solid eps components), 25% loose
      (0.08 — within-cos ~0.55 +- 0.074, ~2% of within pairs fall
      below eps): components EXIST, some straddle, none percolate.
      q235 is the pre-flight that asserts it.

    Every other table is symlinked from the replica corpus — only the
    embedding geometry changes."""
    import math

    sig_tight, sig_loose, jitter = 0.055, 0.08, 0.01
    dst = os.path.join(out_dir, "embeddings.parquet")
    if not os.path.exists(dst):
        n = load(spark, src_dir, "embeddings").count() * mult
        m = 1_000_000

        def unif(cols, salt):
            return (
                F.pmod(F.xxhash64(*cols, F.lit(salt)), F.lit(m)) + 0.5
            ) / float(m)

        def gauss(cols, i, salt):
            u1 = unif([*cols, F.lit(i)], salt + "u1")
            u2 = unif([*cols, F.lit(i)], salt + "u2")
            return F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)

        base = spark.range(n).select(F.col("id").alias("vec_id"))
        base = base.withColumn(
            "__c", F.pmod(F.xxhash64("vec_id", F.lit("comp")), F.lit(k))
        )
        sign = (
            F.pmod(F.xxhash64("__c", F.lit("sign")), F.lit(2)) * 2 - 1
        ).cast("double")
        axis = F.pmod(F.col("__c"), F.lit(dim))
        ctr = F.array(
            *[
                F.when(axis == i, sign).otherwise(F.lit(0.0))
                + F.lit(jitter) * gauss([F.col("__c")], i, "ctr")
                for i in range(dim)
            ]
        )
        nrm = F.sqrt(F.aggregate(ctr, F.lit(0.0), lambda a, x: a + x * x))
        sigma = F.when(
            F.pmod(F.xxhash64("__c", F.lit("tier")), F.lit(4)) == 0,
            F.lit(sig_loose),
        ).otherwise(F.lit(sig_tight))
        noise = F.array(
            *[gauss([F.col("vec_id")], i, "pt") for i in range(dim)]
        )
        emb = F.zip_with(
            ctr, noise, lambda cx, nx: (cx / nrm + sigma * nx).cast("float")
        )
        df = base.select(
            "vec_id",
            emb.alias("embedding"),
            F.pmod(F.col("__c"), F.lit(10)).cast("int").alias("label"),
        )
        df.write.mode("overwrite").parquet(dst)
        print(
            f"built {dst} (clustered: k={k} dim={dim} "
            f"sigma={sig_tight}/{sig_loose})",
            flush=True,
        )
    for name in TABLES:
        if name == "embeddings":
            continue
        link = os.path.join(out_dir, f"{name}.parquet")
        target = os.path.join(replica_dir, f"{name}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.abspath(target), link)


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
    ap.add_argument(
        "--clustered",
        action="store_true",
        help="mixture-of-Gaussians embeddings into .scale/sf<N>c "
        "(other tables symlinked from the replica corpus)",
    )
    ap.add_argument("--centers", type=int, default=64)
    args = ap.parse_args()

    sf = 0.1 * args.mult
    scale_root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale"
    )
    replica_dir = os.path.join(scale_root, f"sf{sf}")
    out_dir = replica_dir + "c" if args.clustered else replica_dir
    os.makedirs(replica_dir, exist_ok=True)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("scale_probe_build", cpus=32, shuffle_partitions=32)
    build(spark, args.src, replica_dir, args.mult)
    if args.clustered:
        build_clustered(
            spark, args.src, replica_dir, out_dir, args.mult, k=args.centers
        )
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
