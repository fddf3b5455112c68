"""dbscan_blocked skew guard + routed variant (round-10 verdict item
#7 / ADVICE): a block whose edge count exceeds the cap must fail fast
in the plain form and be routed — exactly — to the distributed
dbscan_from_edges path in the routed form."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _skewed_fixture(spark):
    """Symmetric within-block eps-edges (blk, a, b): a 4-chain in block
    1, a pair in block 2, and an 8-clique in block 3 (56 directed edges
    — the 'oversized' block under a tiny cap). Components are
    block-confined by construction."""
    chain = [(1, x, y) for x, y in ((0, 1), (1, 2), (2, 3))]
    pair = [(2, 10, 11)]
    clique = [
        (3, u, v) for u in range(20, 28) for v in range(20, 28) if u != v
    ]
    directed = [
        e for b, x, y in chain + pair for e in ((b, x, y), (b, y, x))
    ]
    sym = spark.createDataFrame(directed + clique, "blk int, a long, b long")
    ids = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 10, 11, *range(20, 28), 99]], "vec_id long"
    )
    return ids, sym


def test_routed_equals_distributed_on_skewed_blocks(spark):
    from rds_glue_s3_etl_pipeline_spark.operators.dbscan import (
        dbscan_blocked_routed,
        dbscan_from_edges,
    )

    ids, sym = _skewed_fixture(spark)
    truth = {
        r["vec_id"]: (r["role"], r["cluster_id"])
        for r in dbscan_from_edges(ids, sym.select("a", "b"), 2).collect()
    }
    routed = {
        r["vec_id"]: (r["role"], r["cluster_id"])
        for r in dbscan_blocked_routed(
            ids, sym, 2, ["blk"], max_block_edges=10
        ).collect()
    }
    assert routed == truth
    assert truth[99] == ("noise", None)  # isolated id stamped noise
    assert truth[20] == ("core", 20)  # clique core, component-min id


def test_routed_no_oversized_blocks_matches_plain(spark):
    from rds_glue_s3_etl_pipeline_spark.operators.dbscan import (
        dbscan_blocked,
        dbscan_blocked_routed,
    )

    ids, sym = _skewed_fixture(spark)
    plain = {
        r["vec_id"]: (r["role"], r["cluster_id"])
        for r in dbscan_blocked(ids, sym, 2, ["blk"]).collect()
    }
    routed = {
        r["vec_id"]: (r["role"], r["cluster_id"])
        for r in dbscan_blocked_routed(ids, sym, 2, ["blk"]).collect()
    }
    assert routed == plain


def test_plain_form_fails_fast_past_cap(spark):
    from rds_glue_s3_etl_pipeline_spark.operators.dbscan import dbscan_blocked

    ids, sym = _skewed_fixture(spark)
    with pytest.raises(Exception, match="max_block_edges"):
        dbscan_blocked(ids, sym, 2, ["blk"], max_block_edges=10).collect()
