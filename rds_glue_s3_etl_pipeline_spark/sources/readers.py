"""Sources (SURVEY §2.1).

Reference behaviors replaced:
* S1 — S3 JSON read via boto3 + pandas on the driver
  (``gule_test_job.py:54-72``) → ``spark.read.json`` (distributed,
  schema-pinnable, predicate-pushdown capable).
* S2 — Glue DynamicFrame JDBC read (``gule_test_job.py:82-91``,
  MariaDB driver per ``common_settings.json:12-15``) → plain
  ``spark.read.format("jdbc")`` with partitioned-read options; the
  reference read a whole table over one connection.
* S3 — ``toPandas()`` collect (``gule_test_job.py:94``) → eliminated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_json_records(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    multi_line: bool = True,
) -> DataFrame:
    """Read a JSON file of record objects (the reference's S3 feed is
    one object-array document, hence multiLine=True). Pin a schema
    whenever known — inference costs a full extra pass at scale."""
    reader = spark.read.option("multiLine", multi_line)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = "org.mariadb.jdbc.Driver",
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 16,
    fetch_size: int = 10_000,
):
    """Configured JDBC DataFrameReader (call ``.load()`` to execute).

    Unlike the reference's single-connection whole-table read, a
    partitioned read splits the table into ``num_partitions`` range
    scans so ingest parallelizes across the cluster; always pass the
    primary key as ``partition_column`` for production reads.
    Returned unloaded so tests can assert the configuration without a
    live database.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("fetchsize", fetch_size)
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound if lower_bound is not None else 0)
            .option("upperBound", upper_bound if upper_bound is not None else 1_000_000)
            .option("numPartitions", num_partitions)
        )
    return reader


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — same columnar pushdown/pruning properties as
    parquet via Spark's native reader; here for lake interop (the
    format a Hive-era warehouse hands you)."""
    return spark.read.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """XML source (Spark 4 native, the former spark-xml connector) —
    legacy-feed interop: one DataFrame row per ``row_tag`` element,
    nested elements as structs/arrays. Pass an explicit schema in
    production (same pinned-schema rule as the JSON feed, SURVEY §7a);
    inference reads the data twice."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
