"""Multimodal columns (north-star extension): image/audio/video as
opaque ``binary`` payloads with typed metadata, processed batch-wise
through Arrow (``mapInPandas``).

The container has no image/audio codecs, so the decode step is a
STUB: ``decode_image_stub`` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a deterministic fake
"decode" (byte-histogram features) with the exact schema, batching,
and partitioning a real decoder (PIL/ffmpeg) would use. Everything
around the stub — binary column handling, Arrow batch iteration,
schema declaration, partition sizing — is real and tested.

Scale notes: mapInPandas streams Arrow record batches; payload bytes
never land on the driver. Partition count governs decoder parallelism
and peak memory (batch_rows × payload_size per worker) — repartition
upstream by payload-size budget, not row count, for real media.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Typed metadata the engine carries for every media payload.
MEDIA_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, content_hash string, "
    "payload binary"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, content_hash string, "
    "mean_byte double, max_byte long, histogram_head array<long>"
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a media table from the documents fixture: the UTF-8 bytes
    of the text stand in for an encoded payload (deterministic, no
    codec needed). Real ingestion would read raw bytes via
    ``spark.read.format("binaryFile")``."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_hash"),
        payload.alias("payload"),
    )


def decode_image_stub(payload: bytes, fake: bool = False) -> dict:
    """Decode one payload. Real implementation requires an image codec
    (PIL / libjpeg) that this container does not ship."""
    if not fake:
        raise NotImplementedError(
            "image decode requires a codec library not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    mean = sum(payload) / len(payload) if payload else 0.0
    return {
        "mean_byte": mean,
        "max_byte": max(payload) if payload else 0,
        "histogram_head": [payload.count(b) for b in range(4)],
    }


def sample_frames_stub(payload: bytes, every_n: int = 1000, fake: bool = False) -> list[bytes]:
    """Frame-sampling stub (video analog): real implementation needs
    ffmpeg. The fake slices the byte stream at frame boundaries."""
    if not fake:
        raise NotImplementedError("frame sampling requires ffmpeg")
    return [payload[i : i + 16] for i in range(0, len(payload), every_n)]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Feature extraction over media payloads via mapInPandas — the
    Spark-side plumbing a real decoder plugs into unchanged (swap
    ``decode_image_stub(fake=True)`` for the codec call)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_stub(p, fake=True) for p in pdf["payload"]]
            out = pdf[["doc_id", "media_type", "n_bytes", "content_hash"]].copy()
            out["mean_byte"] = [f["mean_byte"] for f in feats]
            out["max_byte"] = [f["max_byte"] for f in feats]
            out["histogram_head"] = [f["histogram_head"] for f in feats]
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes long, frame_hash string"


def sample_frame_table(
    media: DataFrame, every_n: int = 256, frame_len: int = 16
) -> DataFrame:
    """Frame-sampling as a table expansion: one output row per sampled
    frame (the video equivalent of a UDTF), via mapInPandas so frame
    extraction happens inside Arrow batches on executors. Uses the
    deterministic fake slicer (``sample_frames_stub`` semantics) —
    a real pipeline swaps in ffmpeg keyframe extraction with the same
    schema and batch shape."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                for idx, off in enumerate(range(0, max(len(payload), 1), every_n)):
                    frame = payload[off : off + frame_len]
                    rows.append(
                        (doc_id, idx, len(frame), hashlib.md5(frame).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame_hash"]
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
