"""Measure incremental multi-probe DBSCAN's refresh-alone cost vs a
full rebuild (q228's blast-radius claim, quantified — round-12 form:
the incremental unit is the per-block directed eps-CANDIDATE-EDGE
list, not per-block clusterings, because mp components span blocks).

q228's bench row INCLUDES the epoch-0 build (the oracle contract needs
both epochs in one query), so the row alone cannot show the saving.
This probe separates the two in a warm-index session:

  rebuild  = score ALL probe x home candidates + label (q223's shape)
  refresh  = given persisted epoch-0 candidate edges over history,
             re-score ONLY blocks the ~1% batch probes into, read
             untouched blocks' edges back verbatim, then re-label the
             merged (tiny) edge list

Usage: python tools/dbscan_refresh_probe.py [--sf .scale/sf1.0]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from rds_glue_s3_etl_pipeline_spark.operators.dbscan import (  # noqa: E402
    dbscan_from_edges,
)
from rds_glue_s3_etl_pipeline_spark.queries.vector6 import (  # noqa: E402
    _DBSCAN_MIN_NBRS,
    _DBSCAN_NPROBE,
    _KNN_INC_MOD,
    _knn_assignments,
    _mp_eps_candidates,
    _mp_symmetrize,
)
from rds_glue_s3_etl_pipeline_spark.scratch import parquet_checkpoint  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".scale/sf1.0")
    args = ap.parse_args()
    spark = get_spark("dbscan_refresh_probe", cpus=32, shuffle_partitions=32)

    # index build here (untimed: shared artifact)
    home, probe, block_cols = _knn_assignments(spark, args.sf, _DBSCAN_NPROBE)
    ids = home.select("vec_id")
    is_new = F.col("vec_id") % _KNN_INC_MOD == 0

    def label(cand):
        return dbscan_from_edges(ids, _mp_symmetrize(cand), _DBSCAN_MIN_NBRS)

    # warm + best-of-2 rebuild
    best_rebuild = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        materialize(label(_mp_eps_candidates(probe, home, block_cols)))
        el = time.perf_counter() - t0
        if i:
            best_rebuild = min(best_rebuild, el)

    # epoch-0 candidate edges over history, persisted (untimed state)
    e0 = parquet_checkpoint(
        _mp_eps_candidates(
            probe.filter(~is_new), home.filter(~is_new), block_cols
        ),
        "probe_dbscan_mp_epoch0_",
    )

    n_blocks = home.select(*block_cols).distinct().count()
    n_touched = probe.filter(is_new).select(*block_cols).distinct().count()

    best_refresh = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        touched = probe.filter(is_new).select(*block_cols).distinct()
        cand1 = _mp_eps_candidates(
            probe.join(touched, block_cols),
            home.join(touched, block_cols),
            block_cols,
        )
        untouched = e0.join(touched, block_cols, "left_anti")
        materialize(label(untouched.unionByName(cand1)))
        el = time.perf_counter() - t0
        if i:
            best_refresh = min(best_refresh, el)

    print(
        f"rebuild {best_rebuild:.2f}s | refresh {best_refresh:.2f}s "
        f"({best_refresh / best_rebuild:.0%} of rebuild) | touched "
        f"{n_touched}/{n_blocks} blocks ({n_touched / n_blocks:.0%})"
    )


if __name__ == "__main__":
    main()
