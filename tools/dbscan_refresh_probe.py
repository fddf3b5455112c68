"""Measure incremental multi-probe DBSCAN's refresh-alone cost vs a
full rebuild (q228's blast-radius claim, quantified — round-12 form:
the incremental unit is the per-block directed eps-CANDIDATE-EDGE
list, not per-block clusterings, because mp components span blocks).

q228's bench row INCLUDES the epoch-0 build (the oracle contract needs
both epochs in one query), so the row alone cannot show the saving.
This probe separates the two in a warm-index session:

  rebuild  = score ALL probe x home candidates + label (q223's shape)
  refresh  = given the persisted epoch-0 (hist x hist) edge list,
             score only the pairs the ~1% batch can create —
             probes(batch) x home(full) and probes(hist) x
             home(batch), the endpoint-membership partition — then
             re-label the merged (tiny) edge list. (A touched-block
             strategy degenerates to 2x rebuild here: the 17-block
             probe footprint of a 1% batch touches ~every block.)

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
    _dbscan_nprobe,
    _KNN_INC_MOD,
    _knn_assignments,
    _knn_index,
    _MP_MAX_BLOCK_EDGES,
    _mp_block_guard,
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
    home, probe, block_cols = _knn_assignments(
        spark, args.sf, _dbscan_nprobe(_knn_index(spark, args.sf)["ks"])
    )
    # full-table guard upper-bounds every filtered sub-join below
    # (round-13 ADVICE: the probe's joins had no hub-block guard)
    _mp_block_guard(probe, home, block_cols, _MP_MAX_BLOCK_EDGES)
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
        ).select("a", "b"),
        "probe_dbscan_mp_epoch0_",
    )

    n_batch = home.filter(is_new).count()
    n_corpus = home.count()

    best_refresh = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        c_new_a = _mp_eps_candidates(
            probe.filter(is_new), home, block_cols
        ).select("a", "b")
        c_hist_new = _mp_eps_candidates(
            probe.filter(~is_new), home.filter(is_new), block_cols
        ).select("a", "b")
        materialize(label(e0.unionByName(c_new_a).unionByName(c_hist_new)))
        el = time.perf_counter() - t0
        if i:
            best_refresh = min(best_refresh, el)

    print(
        f"rebuild {best_rebuild:.2f}s | refresh {best_refresh:.2f}s "
        f"({best_refresh / best_rebuild:.0%} of rebuild) | batch "
        f"{n_batch}/{n_corpus} vectors"
    )


if __name__ == "__main__":
    main()
