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
