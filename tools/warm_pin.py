"""Isolated warm best-of-3 pin for a set of queries — the measurement
protocol every >2x bench move must pass before it is called a
regression (SCALE.md; rounds 11-13: this VM carries a 30-130 s
whole-process stall episode per sweep and a ~5-run JIT warm-up curve
on regex-heavy queries, so single-pass sweep numbers are structurally
untrustworthy for cross-round comparison).

Protocol per query: one untimed pass (page cache + codegen + any
per-corpus artifact build), then three timed passes with
bench.release_blocks between, keep the min; machine canaries bracket
the whole run so VM drift is visible in the artifact.

Usage:
    python tools/warm_pin.py [--sf DIR] q161_... q158_... > pins.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from bench import canary_sec, materialize, release_blocks  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.queries import REGISTRY  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("warm_pin", cpus=32, shuffle_partitions=32)
    canary_sec(spark)  # codegen warm for the canary plan itself
    c_open = min(canary_sec(spark), canary_sec(spark))

    pins: dict[str, dict] = {}
    for name in args.names:
        fn = REGISTRY[name].fn
        materialize(fn(spark, args.sf))  # untimed warm
        release_blocks(spark)
        times = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            materialize(fn(spark, args.sf))
            times.append(round(time.perf_counter() - t0, 3))
            release_blocks(spark)
        pins[name] = {"best": min(times), "times": times}

    c_close = min(canary_sec(spark), canary_sec(spark))
    print(
        json.dumps(
            {
                "sf": args.sf,
                "canary_open": round(c_open, 3),
                "canary_close": round(c_close, 3),
                "pins": pins,
            }
        )
    )


if __name__ == "__main__":
    main()
