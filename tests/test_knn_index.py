"""The persisted ANN index artifact (queries/vector6._knn_index):
build-once semantics per (process, corpus content), fingerprint
invalidation on fixture rebuild, and a readable one-row-per-vector
home assignment."""

from __future__ import annotations

import pyspark.sql.functions as F


def _write_embeddings(spark, out: str, n: int, shift: float = 0.0) -> None:
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(1000)) / 500.0
                 - 1.0 + shift).cast("float")
                for i in range(8)
            ]
        ).alias("embedding"),
        (F.col("id") % 5).cast("int").alias("label"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


def test_knn_index_build_once_and_invalidate(spark, tmp_path):
    from rds_glue_s3_etl_pipeline_spark.queries.vector6 import _knn_index

    out = str(tmp_path / "fix")
    _write_embeddings(spark, out, 40)

    m1 = _knn_index(spark, out)
    home = spark.read.parquet(f"{m1['dir']}/home.parquet")
    assert home.count() == 40
    assert home.select("vec_id").distinct().count() == 40
    assert set(m1["block_cols"]).issubset(set(home.columns))

    # Same content -> cache hit, no rebuild (same artifact dir).
    m2 = _knn_index(spark, out)
    assert m2["dir"] == m1["dir"]

    # Rebuilt fixture (content change -> new file fingerprint) must
    # invalidate: serving the stale grid was round-7 ADVICE's bug
    # class for the snapshot cache.
    _write_embeddings(spark, out, 50, shift=0.25)
    m3 = _knn_index(spark, out)
    assert m3["dir"] != m1["dir"]
    assert spark.read.parquet(f"{m3['dir']}/home.parquet").count() == 50

    # The superseded entry must be EVICTED (dict key dropped, scratch
    # dir removed) — a long-lived service rebuilding corpora must not
    # grow disk/memory unboundedly (round-10 ADVICE).
    import os

    from rds_glue_s3_etl_pipeline_spark.queries.vector6 import _KNN_INDEX_CACHE

    assert not os.path.isdir(m1["dir"])
    path_keys = [k for k in _KNN_INDEX_CACHE if k[0] == os.path.abspath(out)]
    assert len(path_keys) == 1
