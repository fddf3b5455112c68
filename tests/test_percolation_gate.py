"""q235's two-tier percolation gate (round 14): mean degree alone
conflates density with percolation — a dense CLUSTERED corpus must
pass ('ok dense clustered'), a percolating chain must FAIL, and the
sparse regime keeps the old tier-1 'ok'."""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)


def _write(spark, out, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{out}/embeddings.parquet")


def _gate(spark, out):
    from rds_glue_s3_etl_pipeline_spark.queries import REGISTRY

    return REGISTRY["q235_eps_percolation_guard"].fn(spark, out).collect()[0]


def test_dense_clustered_passes_tier2(spark, tmp_path):
    # 4 tight clusters on orthogonal axes of dim 8: within-cluster
    # cos ~1 (degree ~9 >> ceiling 2), neighborhoods perfectly closed.
    rows = []
    for i in range(40):
        c = i % 4
        v = [0.0] * 8
        v[c] = 1.0
        v[4 + c] = 0.05 * ((i * 37 % 11) - 5)  # tiny per-point wiggle
        rows.append((i, [float(x) for x in v], c))
    out = str(tmp_path / "dense")
    _write(spark, out, rows)
    r = _gate(spark, out)
    assert r["est_mean_degree"] > 2.0
    assert r["expansion_frac"] < 0.05
    assert r["percolation_gate"] == "ok dense clustered"


def test_percolating_chain_fails(spark, tmp_path):
    # a slowly rotating circle: each vector is eps-close to its ~4
    # nearest chain neighbors only, but the chain is ONE giant
    # component — dense AND open neighborhoods.
    rows = []
    n, theta = 80, 0.5
    for i in range(n):
        v = [math.cos(i * theta), math.sin(i * theta)] + [0.0] * 6
        rows.append((i, [float(x) for x in v], 0))
    out = str(tmp_path / "chain")
    _write(spark, out, rows)
    r = _gate(spark, out)
    assert r["est_mean_degree"] > 2.0
    assert r["expansion_frac"] > 0.2
    assert r["percolation_gate"] == "FAIL percolating eps"


def test_sparse_keeps_tier1_ok(spark, tmp_path):
    # near-orthogonal one-hots: no eps edges at all
    rows = []
    for i in range(24):
        v = [0.0] * 8
        v[i % 8] = 1.0 if i < 8 else -1.0 if i < 16 else 0.0
        if i >= 16:
            v[i % 8] = 1.0
            v[(i + 3) % 8] = -1.0
        rows.append((i, [float(x) for x in v], 0))
    out = str(tmp_path / "sparse")
    _write(spark, out, rows)
    r = _gate(spark, out)
    assert r["est_mean_degree"] <= 2.0
    assert r["percolation_gate"] == "ok"
