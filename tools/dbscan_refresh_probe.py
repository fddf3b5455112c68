"""Measure incremental grid-DBSCAN's refresh-alone cost vs a full
rebuild (q228's blast-radius claim, quantified).

q228's bench row INCLUDES the epoch-0 build (the oracle contract needs
both epochs in one query), so the row alone cannot show the saving.
This probe separates the two in a warm-index session:

  rebuild  = one-shot grid DBSCAN over the full corpus (q223's shape)
  refresh  = given a persisted epoch-0 over history, fold the ~1%
             batch in: re-cluster ONLY touched blocks, read untouched
             assignments back verbatim, union

Usage: python tools/dbscan_refresh_probe.py [--sf .scale/sf1.0]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from rds_glue_s3_etl_pipeline_spark.operators.dbscan import (  # noqa: E402
    dbscan_blocked,
)
from rds_glue_s3_etl_pipeline_spark.queries.vector6 import (  # noqa: E402
    _DBSCAN_MIN_NBRS,
    _KNN_INC_MOD,
    _grid_eps_edges,
    _knn_assignments,
)
from rds_glue_s3_etl_pipeline_spark.scratch import parquet_checkpoint  # noqa: E402
from rds_glue_s3_etl_pipeline_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def block_dbscan(members, block_cols):
    roles = dbscan_blocked(
        members.select("vec_id"), _grid_eps_edges(members, block_cols),
        _DBSCAN_MIN_NBRS, block_cols,
    )
    return roles.join(members.select("vec_id", *block_cols), "vec_id")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".scale/sf1.0")
    args = ap.parse_args()
    spark = get_spark("dbscan_refresh_probe", cpus=32, shuffle_partitions=32)

    home, _, block_cols = _knn_assignments(spark, args.sf)  # index build here
    is_new = F.col("vec_id") % _KNN_INC_MOD == 0

    # warm + best-of-2 rebuild
    best_rebuild = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        materialize(block_dbscan(home, block_cols))
        el = time.perf_counter() - t0
        if i:
            best_rebuild = min(best_rebuild, el)

    # epoch-0 over history, persisted (untimed: amortized state)
    g0 = parquet_checkpoint(
        block_dbscan(home.filter(~is_new), block_cols), "probe_dbscan_epoch0_"
    )

    batch = home.filter(is_new)
    n_blocks = home.select(*block_cols).distinct().count()
    touched = batch.select(*block_cols).distinct()
    n_touched = touched.count()

    best_refresh = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        t = batch.select(*block_cols).distinct()
        members = home.join(t, block_cols)
        g1 = block_dbscan(members, block_cols)
        untouched = g0.join(t, block_cols, "left_anti")
        materialize(untouched.unionByName(g1).select("vec_id", "role", "cluster_id"))
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
