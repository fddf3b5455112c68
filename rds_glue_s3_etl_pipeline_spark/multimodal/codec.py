"""Multimodal columns (north-star extension): image/audio/video as
opaque ``binary`` payloads with typed metadata, processed batch-wise
through Arrow (``mapInPandas``).

Decode support is split by format family:

* UNCOMPRESSED formats decode for real, in pure Python (``struct``),
  no codec library needed: 24-bit BMP (``decode_bmp24``) and 16-bit
  PCM mono WAV (``decode_wav16``) — header parse, row/chunk walk,
  actual pixel/sample recovery. q128/q129 hash-verify the features
  against a DuckDB oracle that recomputes them from the source bytes.
* COMPRESSED formats (JPEG/PNG/MP3/H.264) require codec libraries the
  container does not ship, so ``decode_image_stub`` raises
  ``NotImplementedError`` unless ``fake=True`` (deterministic
  byte-histogram fake with the exact schema, batching, and
  partitioning a real decoder would use).

Scale notes: mapInPandas streams Arrow record batches; payload bytes
never land on the driver. Partition count governs decoder parallelism
and peak memory (batch_rows × payload_size per worker) — repartition
upstream by payload-size budget, not row count, for real media.
"""

from __future__ import annotations

import struct
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


# --------------------------------------------------------------------------
# Real decoders for uncompressed formats (pure Python, struct only).
# --------------------------------------------------------------------------

def encode_bmp24(width: int, height: int, pixels: bytes) -> bytes:
    """Write a 24-bit uncompressed BMP. ``pixels`` is top-down
    row-major BGR, ``len == width*height*3``. Rows are written
    bottom-up with 4-byte padding, per the format."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 bytes")
    row_raw = width * 3
    pad = (-row_raw) % 4
    body = b"".join(
        pixels[r * row_raw : (r + 1) * row_raw] + b"\x00" * pad
        for r in range(height - 1, -1, -1)
    )
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + body


def decode_bmp24(payload: bytes) -> dict:
    """Parse a 24-bit uncompressed BMP: validate magic, walk the
    bottom-up (or top-down, negative height) padded rows, return
    dimensions plus the recovered top-down row-major pixel bytes."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
    _, width, height, _, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP is supported (bpp={bpp}, "
            f"compression={comp}); compressed images need a codec library"
        )
    top_down, h = height < 0, abs(height)
    row_raw = width * 3
    stride = row_raw + ((-row_raw) % 4)
    px = bytearray()
    for r in range(h):
        src = r if top_down else h - 1 - r
        start = offset + src * stride
        px += payload[start : start + row_raw]
    return {"width": width, "height": h, "pixels": bytes(px)}


def encode_wav16(samples, sample_rate: int = 16000) -> bytes:
    """Write a 16-bit PCM mono RIFF/WAVE file from int samples."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav16(payload: bytes) -> dict:
    """Parse a RIFF/WAVE container: walk chunks (word-aligned), require
    16-bit PCM mono, unpack the actual samples."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_fmt != 1 or bits != 16 or channels != 1:
        raise NotImplementedError(
            f"only 16-bit PCM mono is supported (fmt={audio_fmt}, "
            f"bits={bits}, channels={channels}); compressed audio needs ffmpeg"
        )
    samples = struct.unpack(f"<{len(data) // 2}h", data)
    return {"sample_rate": rate, "samples": samples}


# Deterministic media synthesis from the documents fixture: the text
# bytes become pixel/sample values, so a DuckDB oracle can recompute
# every decoded feature from the source table (ASCII fixture: chars ==
# bytes, same contract q86 relies on).
BMP_W = BMP_H = 8
_BMP_PIXEL_BYTES = BMP_W * BMP_H * 3  # 192, row stride 24 -> no padding
WAV_RATE = 16000

BMP_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, mean_px double, max_px long"
)
WAV_FEATURE_SCHEMA = (
    "doc_id long, n_samples long, sample_rate int, peak long, mean_amp double"
)


def attach_bmp_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a REAL 8×8 24-bit BMP per document (pixel bytes = first
    192 text bytes, zero-padded) inside mapInPandas — executor-side,
    Arrow-batched, payloads never on the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_bmp24(
                    BMP_W,
                    BMP_H,
                    t.encode("utf-8")[:_BMP_PIXEL_BYTES].ljust(_BMP_PIXEL_BYTES, b"\x00"),
                )
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_type": "image/bmp", "payload": payloads}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id long, media_type string, payload binary"
    )


def attach_wav_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a REAL 16-bit PCM WAV per document: sample_i =
    (byte_i - 128) * 256 over the text bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_wav16(
                    [(b - 128) * 256 for b in t.encode("utf-8")], WAV_RATE
                )
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media_type": "audio/wav", "payload": payloads}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id long, media_type string, payload binary"
    )


def decode_bmp_features(media: DataFrame) -> DataFrame:
    """Decode BMP payloads (REAL header parse + pixel recovery) and
    reduce to per-image features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_bmp24(bytes(payload))
                px = img["pixels"]
                rows.append(
                    (
                        doc_id,
                        img["width"],
                        img["height"],
                        sum(px) / len(px),
                        max(px),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mean_px", "max_px"]
            )

    return media.mapInPandas(run, BMP_FEATURE_SCHEMA)


def decode_wav_features(media: DataFrame) -> DataFrame:
    """Decode WAV payloads (REAL chunk walk + sample unpack) and reduce
    to per-clip features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                wav = decode_wav16(bytes(payload))
                s = wav["samples"]
                rows.append(
                    (
                        doc_id,
                        len(s),
                        wav["sample_rate"],
                        max(abs(v) for v in s),
                        sum(s) / len(s),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "sample_rate", "peak", "mean_amp"],
            )

    return media.mapInPandas(run, WAV_FEATURE_SCHEMA)


# Energy-based activity segmentation (the VAD shape): fixed frames,
# integer activity test (sum |amplitude| >= threshold x frame length —
# no sqrt, no float compare), consecutive active frames merge into
# segments. All arithmetic is exact integers until the final report.
VAD_FRAME = 16  # samples per frame
VAD_TH = 40 * 256  # per-sample mean |amplitude| threshold

VAD_SCHEMA = (
    "doc_id long, n_frames long, n_active long, n_segments long, "
    "longest_segment long"
)


def segment_wav_activity(media: DataFrame) -> DataFrame:
    """Decode WAV payloads (REAL chunk walk) and segment each clip into
    active-energy runs: a frame of VAD_FRAME samples is active iff
    sum(|s|) >= VAD_TH * n_samples_in_frame; consecutive active frames
    form one segment. Per-clip state is one clip's frame list — tiny —
    so the Arrow batch never grows with corpus size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = decode_wav16(bytes(payload))["samples"]
                frames = [
                    s[i : i + VAD_FRAME] for i in range(0, len(s), VAD_FRAME)
                ]
                active = [
                    sum(abs(v) for v in fr) >= VAD_TH * len(fr) for fr in frames
                ]
                n_segments = longest = cur = 0
                for a in active:
                    if a:
                        cur += 1
                        if cur == 1:
                            n_segments += 1
                        longest = max(longest, cur)
                    else:
                        cur = 0
                rows.append(
                    (doc_id, len(frames), sum(active), n_segments, longest)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_frames",
                    "n_active",
                    "n_segments",
                    "longest_segment",
                ],
            )

    return media.mapInPandas(run, VAD_SCHEMA)


# Perceptual average-hash (aHash) over the decoded 8x8 image: per-pixel
# gray = B+G+R (integer sum, no division), bit = gray strictly above the
# image mean (gray*64 > total — exact integer compare), packed into four
# 16-bit bands so a banded Hamming join needs no 64-bit unsigned type on
# any engine.
AHASH_BANDS = 4
AHASH_BAND_BITS = 16
AHASH_SCHEMA = "doc_id long, b0 int, b1 int, b2 int, b3 int, ones int"


def ahash_bmp(media: DataFrame) -> DataFrame:
    """Decode BMP payloads (REAL header parse + bottom-up row walk) and
    reduce each image to its 64-bit average-hash, split into 4x16-bit
    bands (b0 = pixels 0-15, row-major top-down). All arithmetic is
    exact integers, so an external engine reproduces the fingerprint
    bit-for-bit from the source bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_bmp24(bytes(payload))
                px = img["pixels"]
                grays = [
                    px[3 * i] + px[3 * i + 1] + px[3 * i + 2]
                    for i in range(len(px) // 3)
                ]
                total = sum(grays)
                bits = [1 if g * len(grays) > total else 0 for g in grays]
                bands = [
                    sum(
                        bits[j] << (j - i * AHASH_BAND_BITS)
                        for j in range(i * AHASH_BAND_BITS, (i + 1) * AHASH_BAND_BITS)
                    )
                    for i in range(AHASH_BANDS)
                ]
                rows.append((doc_id, *bands, sum(bits)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "b0", "b1", "b2", "b3", "ones"]
            )

    return media.mapInPandas(run, AHASH_SCHEMA)


def ehash_wav(media: DataFrame) -> DataFrame:
    """Decode WAV payloads (REAL RIFF chunk walk) and reduce each clip
    to a 64-bit ENERGY hash — the audio analog of ahash_bmp: the clip
    is cut into 64 time frames (frame of sample i = i*64 // n, so the
    fingerprint is length-normalized), frame bit = frame's mean |amp|
    strictly above the clip mean (exact integer cross-multiply:
    sum_f * n > total * n_f), packed into four 16-bit bands. Same
    banded-Hamming dedup contract as the image hash; an external
    engine reproduces every bit from the source bytes.

    Zero-sample clips emit NO row (a fingerprint of silence-of-length-
    zero is meaningless, and the q220 oracle's generate_series over an
    empty clip is empty — emitting an all-zero row here would be a
    latent row-count divergence; round-9 ADVICE)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = decode_wav16(bytes(payload))["samples"]
                n = len(samples)
                if n == 0:
                    continue
                e = [0] * 64
                nf = [0] * 64
                for i, s in enumerate(samples):
                    f = i * 64 // n
                    e[f] += abs(s)
                    nf[f] += 1
                total = sum(e)
                bits = [
                    1 if e[f] * n > total * nf[f] else 0 for f in range(64)
                ]
                bands = [
                    sum(
                        bits[j] << (j - i * AHASH_BAND_BITS)
                        for j in range(i * AHASH_BAND_BITS, (i + 1) * AHASH_BAND_BITS)
                    )
                    for i in range(AHASH_BANDS)
                ]
                rows.append((doc_id, *bands, sum(bits)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "b0", "b1", "b2", "b3", "ones"]
            )

    return media.mapInPandas(run, AHASH_SCHEMA)
