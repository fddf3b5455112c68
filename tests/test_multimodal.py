from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from rds_glue_s3_etl_pipeline_spark.catalog import load
from rds_glue_s3_etl_pipeline_spark.multimodal.codec import (
    attach_binary_payload,
    decode_image_stub,
    extract_features,
    sample_frames_stub,
)


def test_decode_stub_gated():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"abc")
    with pytest.raises(NotImplementedError):
        sample_frames_stub(b"abc")


def test_attach_and_extract_features(spark, sf_dir):
    # filter, not limit: limit after the catalog's round-robin
    # repartition is nondeterministic across evaluations
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    media = attach_binary_payload(docs)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    by_id = {r["doc_id"]: r for r in rows}
    for doc_id, r in list(by_id.items())[:5]:
        raw = texts[doc_id].encode("utf-8")
        assert r["n_bytes"] == len(raw)
        assert r["content_hash"] == hashlib.md5(raw).hexdigest()
        assert r["mean_byte"] == pytest.approx(sum(raw) / len(raw))
        assert r["max_byte"] == max(raw)
        assert r["histogram_head"] == [raw.count(b) for b in range(4)]


def test_feature_schema_stable(spark, sf_dir):
    media = attach_binary_payload(load(spark, sf_dir, "documents").limit(1))
    feats = extract_features(media)
    assert [f[0] for f in feats.dtypes] == [
        "doc_id", "media_type", "n_bytes", "content_hash",
        "mean_byte", "max_byte", "histogram_head",
    ]
