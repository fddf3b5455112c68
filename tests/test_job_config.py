"""Config-driven job runner: the reference's configs.json surface
compiled into the pipeline (sources -> merge -> csv -> notify)."""

from __future__ import annotations

import csv
import json

import pytest

from rds_glue_s3_etl_pipeline_spark.job_config import run_job
from rds_glue_s3_etl_pipeline_spark.notify import CollectingNotifier
from rds_glue_s3_etl_pipeline_spark.pipeline import PipelineError


@pytest.fixture()
def config(tmp_path):
    feed = tmp_path / "feed.json"
    feed.write_text(json.dumps([
        {"id": 1, "name": "alice", "score": 1.5},
        {"id": 2, "name": None, "score": None},
    ]))
    fb = tmp_path / "fallback.json"
    fb.write_text(json.dumps([
        {"id": 2, "name": "bob", "score": 2.5, "extra": "x"},
        {"id": 9, "name": "zed", "score": 9.0, "extra": "y"},
    ]))
    return {
        "primary": {
            "format": "json",
            "path": str(feed),
            "schema": "id long, name string, score double",
        },
        "fallback": {
            "format": "json",
            "path": str(fb),
            "schema": "id long, name string, score double, extra string",
        },
        "output": {"path": str(tmp_path / "out" / "merged.csv")},
        "merge": {"key": "id"},
    }


def test_run_job_end_to_end(spark, config):
    notifier = CollectingNotifier()
    result = run_job(spark, config, notifier=notifier)
    assert result.merged_rows == 2
    assert result.audit["displayed_ids"] == [9]
    with open(result.output_path) as f:
        rows = {r["id"]: r for r in csv.DictReader(f)}
    assert rows["2"]["name"] == "bob"
    assert any(m.startswith("SUCCESS") for m in notifier.messages)


def test_run_job_from_json_file(spark, config, tmp_path):
    cfg_path = tmp_path / "job.json"
    cfg_path.write_text(json.dumps(config))
    result = run_job(spark, str(cfg_path), notifier=CollectingNotifier())
    assert result.merged_rows == 2


def test_run_job_json_feed_source(spark, config):
    config["primary"]["format"] = "json_feed"
    result = run_job(spark, config, notifier=CollectingNotifier())
    assert result.merged_rows == 2


def test_run_job_bad_source_notifies(spark, config, tmp_path):
    config["primary"]["path"] = str(tmp_path / "missing" / "nope.json")
    config["primary"]["schema"] = None  # force schema inference -> read fails
    notifier = CollectingNotifier()
    with pytest.raises(PipelineError):
        run_job(spark, config, notifier=notifier)
    assert notifier.messages[0].startswith("ERROR: failed to read primary")


def test_run_job_missing_block_raises(spark, config):
    del config["output"]
    with pytest.raises(ValueError):
        run_job(spark, config)
