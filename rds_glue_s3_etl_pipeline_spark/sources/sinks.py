"""Sinks (SURVEY §2.1 S4/S6).

The reference serializes the whole merged result to one in-memory CSV
string on the driver and ``put_object``s it (``gule_test_job.py:200-211``)
— a driver-OOM at scale. Here the single-file contract is preserved
with ``coalesce(1)`` (executor-side write, constant driver memory),
and partitioned parquet is the default for anything large.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_single_csv(df: DataFrame, path: str, header: bool = True) -> str:
    """Write ``df`` as exactly one CSV file at ``path``.

    Spark writes a directory of part files; we coalesce to one
    partition and move the single part file to the requested path.
    Use only when a downstream consumer genuinely requires one file —
    at 100 TB use ``write_parquet`` (partitioned) instead.
    """
    tmp = path + ".spark-tmp"
    df.coalesce(1).write.mode("overwrite").option("header", header).csv(tmp)
    [part] = glob.glob(os.path.join(tmp, "part-*.csv"))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    shutil.move(part, path)
    shutil.rmtree(tmp)
    return path


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> str:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def compact_parquet(
    spark,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> int:
    """Compact a small-files parquet directory into ~``target_file_bytes``
    files; returns the output file count.

    The small-files problem is THE steady-state killer of a streaming/
    incremental 100 TB lake: every micro-batch or hourly job drops a
    few KB-to-MB files, listing cost grows linearly, and scan tasks
    shrink until scheduler overhead dominates. Compaction is a
    maintenance rewrite: size the partition count from the actual input
    bytes, optionally re-sort within files so min/max row-group stats
    stay selective (pair with operators/layout.py z-ordering for
    multi-column pruning).

    File count = ceil(input_bytes / target). Data-dependent but
    deterministic; the rewrite itself is one narrow repartition (or a
    range-partitioned sort when ``sort_by`` is given — the sort IS the
    shuffle, no extra exchange).
    """
    import math

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src_dir)
        for f in files
        if f.endswith(".parquet") or f.startswith("part-")
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    if sort_by:
        df = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(dst_dir)
    return len(glob.glob(os.path.join(dst_dir, "part-*.parquet")))


def write_token_balanced_shards(
    df: DataFrame,
    path: str,
    weight_col: str,
    order_cols,
    target_weight_per_shard: int,
) -> int:
    """Write training-export shards of ≈equal total ``weight_col``
    (token count, char count, ...) in ``order_cols`` order; returns the
    shard count. Documents are never split; a shard overshoots its
    target by at most one document, and a document heavier than the
    target gets a shard to itself.

    Training-data exports want this instead of row-count or byte-count
    splits: downstream loaders budget per-shard TOKENS, and naive
    row-balanced shards skew 10x when document lengths do.

    Scale: shard assignment is floor(exclusive-prefix-weight / target),
    computed by the two-pass prefix machinery (operators/prefix.py) —
    one range shuffle plus a kilobyte-sized offsets job, never a
    single-partition window. The write repartitions on shard id so each
    output directory is one task's file.
    """
    from pyspark.sql import functions as F

    from ..operators.prefix import global_running_sum

    cum = global_running_sum(df, order_cols, value=weight_col, out_col="__cum")
    sharded = cum.withColumn(
        "shard",
        F.floor(
            (F.col("__cum") - F.col(weight_col))
            / F.lit(float(target_weight_per_shard))
        ).cast("long"),
    ).drop("__cum")
    max_shard = sharded.agg(F.max("shard")).collect()[0][0]
    if max_shard is None:
        # Empty input: write a readable schema-only dataset (one empty
        # file, no partition dirs) and report zero shards instead of
        # crashing on None + 1.
        sharded.coalesce(1).write.mode("overwrite").parquet(path)
        return 0
    n_shards = max_shard + 1
    (
        sharded.repartition(int(n_shards), "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return int(n_shards)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> str:
    """ORC sink (native writer, zlib default) — parity surface with
    write_parquet for warehouses standardized on ORC."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
    return path


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> str:
    """XML sink (Spark 4 native) — the export shape consumed by
    legacy/B2B integrations that predate parquet."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )
    return path
