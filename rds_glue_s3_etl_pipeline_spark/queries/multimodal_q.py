"""Multimodal queries: binary payload plumbing through mapInPandas.

The oracle checks the payload metadata (byte length + content hash) —
DuckDB can reproduce those exactly; the decoded features (byte stats)
ride through the same mapInPandas pass and are covered by unit tests.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load
from ..multimodal.codec import attach_binary_payload, extract_features
from .registry import query

_Q35_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_hash
FROM documents
"""


@query("q35_multimodal_metadata", oracle=_Q35_ORACLE, tags=("multimodal", "EXT"))
def q35_multimodal_metadata(spark, sf_dir):
    """Binary media column metadata, produced through the full
    mapInPandas feature-extraction path (Arrow batches, stub decoder)
    and projected to the engine-neutral columns."""
    media = attach_binary_payload(load(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select("doc_id", "n_bytes", "content_hash")


@query("q36_multimodal_features", oracle=None, tags=("multimodal", "EXT", "rows-only"))
def q36_multimodal_features(spark, sf_dir):
    """Full decoded feature set (stub decoder) — rows-only check; the
    byte-level feature math is asserted in tests/test_multimodal.py."""
    media = attach_binary_payload(load(spark, sf_dir, "documents"))
    return extract_features(media).select(
        "doc_id", "n_bytes", "mean_byte", F.col("max_byte").cast("long").alias("max_byte")
    )


_Q86_ORACLE = """
SELECT doc_id,
       CAST((i - 1) // 256 AS INT) AS frame_idx,
       CAST(octet_length(encode(substring(text, i, 16))) AS BIGINT) AS frame_bytes,
       md5(substring(text, i, 16)) AS frame_hash
FROM documents,
     UNNEST(generate_series(1, GREATEST(length(text), 1), 256)) AS u(i)
"""


@query("q86_multimodal_frames", oracle=_Q86_ORACLE, tags=("multimodal", "udtf", "EXT"))
def q86_multimodal_frames(spark, sf_dir):
    """Frame-sampling expansion: one row per sampled 16-byte 'frame'
    every 256 payload bytes, extracted inside mapInPandas (the exact
    plumbing an ffmpeg keyframe sampler plugs into). The oracle
    reproduces the fake frames byte-for-byte from the text payloads
    (ASCII fixture: chars == bytes), so the whole Python expansion
    path is hash-verified, not just row-counted."""
    from ..multimodal.codec import sample_frame_table

    media = attach_binary_payload(load(spark, sf_dir, "documents"))
    return sample_frame_table(media, every_n=256, frame_len=16)
