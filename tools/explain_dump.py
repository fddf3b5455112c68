"""Dump .explain("formatted") for named queries to files — the
before/after plan evidence for optimization rounds (plans/r<N>/).

Usage:
    python tools/explain_dump.py --out plans/r15 --suffix _after [--sf DIR] names...

Note: for queries that materialize state eagerly while being built
(CC loops, checkpoints, snapshot epochs), the dumped plan is the lazy
TAIL over that state; the eager phases are evidenced by the job-count
tables in OPTIMIZATION_r<N>.md instead.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")

from rds_glue_s3_etl_pipeline_spark.queries import REGISTRY  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("explain_dump", cpus=8)
    for name in args.names:
        df = REGISTRY[name].fn(spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)


if __name__ == "__main__":
    main()
