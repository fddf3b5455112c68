"""Bucketed-table co-location (SURVEY §4 / 100 TB design: "co-locate
joins via bucketing or pre-partitioning").

A fact table that is repeatedly joined or aggregated on the same key
should be written bucketed on that key: every join/groupBy on the key
then reads pre-partitioned (and pre-sorted) buckets and skips the
shuffle entirely — at 100 TB that shuffle IS the job cost, so this is
the single highest-leverage storage decision the engine offers.

Spark requires bucketed writes to go through the table catalog
(``saveAsTable``): bucket metadata lives in the catalog, and only
catalog reads (``spark.table``) plan bucket-aware scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and per-bucket sorted) on ``key``.

    ``n_buckets`` should be sized so one bucket of the largest table
    fits an executor's memory at the target scale (at 100 TB with 512MB
    task targets that's O(10^5) buckets, not 32 — it is a per-table
    physical-design choice, exposed here as a parameter).
    """
    keys = [key] if isinstance(key, str) else key
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the only path that plans bucket-aware scans."""
    return spark.table(table)
