"""Config-driven job entry — the reference's operational surface
(SURVEY §3), re-expressed.

The reference job is launched with a resolved-options bag
(``gule_test_job.py:18-41``) populated from ``configs.json``: an S3
JSON source, a JDBC source (credentials via SecretsManager), a CSV
destination, and a Slack webhook. This module accepts the same *shape*
of configuration as a plain dict / JSON file and compiles it into the
pipeline: each source block becomes a lazy loader callable (so read
failures flow through the pipeline's notify-and-abort error channel),
the webhook becomes a Notifier, and the destination becomes the
single-CSV sink.

Config schema (all blocks map 1:1 to a reference concept)::

    {
      "primary":  {"format": "json", "path": ..., "schema": ...},
      "fallback": {"format": "jdbc", "url": ..., "table": ...,
                   "user": ..., "password": ...}          # or any file format
      "output":   {"path": "out/merged.csv"},
      "merge":    {"key": "id", "fallback_order_col": null},   # optional
      "slack":    {"webhook_url": "https://..."}               # optional
    }

No cloud SDKs: paths are whatever the Hadoop FS layer resolves (local,
s3a://, ...), credentials come in the config (the caller owns secret
resolution — this engine never talks to a secrets service).
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .notify import Notifier, NullNotifier, WebhookNotifier
from .pipeline import PipelineResult, run_merge_pipeline
from .sources.readers import jdbc_reader, read_csv, read_json_records, read_parquet


def _loader(spark: SparkSession, block: dict) -> Callable[[], DataFrame]:
    fmt = block.get("format", "json")
    if fmt == "json":
        return lambda: read_json_records(
            spark, block["path"], schema=block.get("schema")
        )
    if fmt == "json_feed":
        from .sources.feed_source import register_feed_source

        def load_feed() -> DataFrame:
            register_feed_source(spark)
            return (
                spark.read.format("json_feed")
                .schema(block["schema"])
                .load(block["path"])
            )

        return load_feed
    if fmt == "parquet":
        return lambda: read_parquet(spark, block["path"])
    if fmt == "csv":
        return lambda: read_csv(spark, block["path"], schema=block.get("schema"))
    if fmt == "xml":
        from .sources.readers import read_xml

        return lambda: read_xml(
            spark,
            block["path"],
            row_tag=block.get("row_tag", "row"),
            schema=block.get("schema"),
        )
    if fmt == "jdbc":
        return lambda: jdbc_reader(
            spark,
            url=block["url"],
            table=block["table"],
            driver=block.get("driver", "org.mariadb.jdbc.Driver"),
            user=block.get("user"),
            password=block.get("password"),
            partition_column=block.get("partition_column"),
            lower_bound=block.get("lower_bound"),
            upper_bound=block.get("upper_bound"),
            num_partitions=block.get("num_partitions", 16),
        ).load()
    raise ValueError(f"unknown source format: {fmt!r}")


def run_job(
    spark: SparkSession,
    config: dict | str,
    notifier: Notifier | None = None,
) -> PipelineResult:
    """Run the merge job described by ``config`` (dict or JSON path).

    An explicit ``notifier`` wins over the config's slack block — tests
    inject a collector; production uses the webhook.
    """
    if isinstance(config, str):
        with open(config) as fh:
            config = json.load(fh)
    for required in ("primary", "fallback", "output"):
        if required not in config:
            raise ValueError(f"job config missing required block {required!r}")

    if notifier is None:
        webhook = (config.get("slack") or {}).get("webhook_url")
        notifier = WebhookNotifier(webhook) if webhook else NullNotifier()

    merge = config.get("merge") or {}
    return run_merge_pipeline(
        _loader(spark, config["primary"]),
        _loader(spark, config["fallback"]),
        output_path=config["output"]["path"],
        key=merge.get("key", "id"),
        notifier=notifier,
        fallback_order_col=merge.get("fallback_order_col"),
    )
