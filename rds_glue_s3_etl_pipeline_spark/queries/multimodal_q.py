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


_Q36_ORACLE = """
SELECT d.doc_id,
       CAST(length(d.text) AS BIGINT) AS n_bytes,
       SUM(ascii(substring(d.text, u.i, 1))) / CAST(length(d.text) AS DOUBLE) AS mean_byte,
       CAST(MAX(ascii(substring(d.text, u.i, 1))) AS BIGINT) AS max_byte
FROM documents d,
     UNNEST(generate_series(1, length(d.text))) AS u(i)
GROUP BY d.doc_id, length(d.text)
"""


@query("q36_multimodal_features", oracle=_Q36_ORACLE, tags=("multimodal", "EXT"))
def q36_multimodal_features(spark, sf_dir):
    """Full decoded feature set through the mapInPandas path —
    hash-verified since round 6: the byte stats are recomputed by the
    oracle from the source text bytes (ASCII fixture: chars == bytes),
    so the Arrow batch iteration and per-payload feature math are
    value-checked, not just row-counted."""
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


# --------------------------------------------------------------------------
# q128/q129: REAL decode of uncompressed formats. The payloads are
# genuine BMP/WAV files built executor-side from the text bytes, so
# the DuckDB oracle can recompute every decoded feature from the
# source table (ASCII fixture: chars == bytes, the q86 contract) —
# the whole encode → header-parse → pixel/sample-recovery → feature
# path is hash-verified, not just row-counted.
# --------------------------------------------------------------------------

_Q128_ORACLE = """
SELECT d.doc_id,
       8 AS width, 8 AS height,
       SUM(ascii(substring(d.text, u.i, 1))) / 192.0 AS mean_px,
       CAST(MAX(ascii(substring(d.text, u.i, 1))) AS BIGINT) AS max_px
FROM documents d,
     UNNEST(generate_series(1, LEAST(length(d.text), 192))) AS u(i)
GROUP BY d.doc_id
"""


@query("q128_bmp_decode", oracle=_Q128_ORACLE, tags=("multimodal", "EXT"))
def q128_bmp_decode(spark, sf_dir):
    """Real image decode: build an 8×8 24-bit BMP per document (pixel
    bytes = first 192 text bytes, zero-padded), parse the header and
    bottom-up padded rows back (multimodal/codec.py decode_bmp24), and
    reduce to per-image features. Zero-pad bytes count toward mean_px
    (sum unchanged, fixed /192 denominator) and never win max_px —
    which is how the oracle reproduces them without modeling padding."""
    from ..multimodal.codec import attach_bmp_payload, decode_bmp_features

    media = attach_bmp_payload(load(spark, sf_dir, "documents"))
    return decode_bmp_features(media)


_Q129_ORACLE = """
SELECT d.doc_id,
       CAST(length(d.text) AS BIGINT) AS n_samples,
       16000 AS sample_rate,
       CAST(MAX(ABS((ascii(substring(d.text, u.i, 1)) - 128) * 256)) AS BIGINT) AS peak,
       SUM((ascii(substring(d.text, u.i, 1)) - 128) * 256) / CAST(length(d.text) AS DOUBLE) AS mean_amp
FROM documents d,
     UNNEST(generate_series(1, length(d.text))) AS u(i)
GROUP BY d.doc_id, length(d.text)
"""


@query("q129_wav_decode", oracle=_Q129_ORACLE, tags=("multimodal", "EXT"))
def q129_wav_decode(spark, sf_dir):
    """Real audio decode: build a 16-bit PCM mono WAV per document
    (sample_i = (byte_i - 128) * 256), walk the RIFF chunks back
    (multimodal/codec.py decode_wav16), unpack the samples, and reduce
    to per-clip features (count, rate, peak, mean amplitude)."""
    from ..multimodal.codec import attach_wav_payload, decode_wav_features

    media = attach_wav_payload(load(spark, sf_dir, "documents"))
    return decode_wav_features(media)


# --------------------------------------------------------------------------
# q179: energy-based activity segmentation over the real WAV decode
# path (the VAD / silence-trimming shape of an audio training
# pipeline). The oracle recomputes every frame from the source bytes:
# frame f covers chars [f*16+1, f*16+16], activity is the exact
# integer test sum(|sample|) >= TH * frame_len, and segments are
# gaps-and-islands over active frame indexes.
# --------------------------------------------------------------------------

_Q179_ORACLE = """
WITH samp AS (
  SELECT d.doc_id,
         CAST((u.i - 1) // 16 AS BIGINT) AS frame,
         ABS((ascii(substring(d.text, u.i, 1)) - 128) * 256) AS amp
  FROM documents d, UNNEST(generate_series(1, length(d.text))) AS u(i)
),
fr AS (
  SELECT doc_id, frame, SUM(amp) AS sum_amp, COUNT(*) AS n
  FROM samp GROUP BY doc_id, frame
),
af AS (
  SELECT doc_id, frame,
         CASE WHEN sum_amp >= 10240 * n THEN 1 ELSE 0 END AS active
  FROM fr
),
act AS (
  SELECT doc_id, frame,
         CASE WHEN lag(frame) OVER (PARTITION BY doc_id ORDER BY frame) IS NULL
                OR frame - lag(frame) OVER (PARTITION BY doc_id ORDER BY frame) > 1
              THEN 1 ELSE 0 END AS new_seg
  FROM af WHERE active = 1
),
seg AS (
  SELECT doc_id, frame,
         SUM(new_seg) OVER (PARTITION BY doc_id ORDER BY frame
                            ROWS UNBOUNDED PRECEDING) AS seg_id
  FROM act
),
seglen AS (
  SELECT doc_id, seg_id, COUNT(*) AS len FROM seg GROUP BY doc_id, seg_id
),
per AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_segments,
         CAST(SUM(len) AS BIGINT) AS n_active,
         CAST(MAX(len) AS BIGINT) AS longest_segment
  FROM seglen GROUP BY doc_id
),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames FROM fr GROUP BY doc_id)
SELECT t.doc_id, t.n_frames,
       COALESCE(p.n_active, 0) AS n_active,
       COALESCE(p.n_segments, 0) AS n_segments,
       COALESCE(p.longest_segment, 0) AS longest_segment
FROM tot t LEFT JOIN per p ON t.doc_id = p.doc_id
"""


@query("q179_wav_activity_segments", oracle=_Q179_ORACLE, tags=("multimodal", "EXT"))
def q179_wav_activity_segments(spark, sf_dir):
    """Activity (VAD-style) segmentation through the REAL audio path:
    encode 16-bit PCM WAV per doc, walk the RIFF chunks back, frame at
    16 samples, integer energy test, island-merge active runs. The
    whole decode+segment pass is one Arrow-batched mapInPandas with
    per-clip state only; the oracle independently reconstructs every
    frame from the source bytes."""
    from ..multimodal.codec import attach_wav_payload, segment_wav_activity

    media = attach_wav_payload(load(spark, sf_dir, "documents"))
    return segment_wav_activity(media)
