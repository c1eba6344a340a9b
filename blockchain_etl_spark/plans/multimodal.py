"""Multimodal plans — binary-column feature extraction and frame sampling
over a media table synthesized deterministically from `documents`
(operators/multimodal.py). The decode itself is stubbed (no image/audio libs
in this container); the dataflow — binary columns, Arrow-batched
mapInPandas, per-type metadata, frame index explode — is real and
oracle-checked because the fake decode is deterministic (md5-derived).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from ..operators.multimodal import extract_media_features, media_from_documents
from ..sources.testdata import load_table
from .registry import register

_MEDIA_TYPE_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)


@register(
    "media_feature_extract",
    sql=f"""
    SELECT doc_id AS media_id,
           {_MEDIA_TYPE_SQL} AS media_type,
           octet_length(encode(text)) AS byte_len,
           CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) AS fp,
           CAST(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 1000 AS VARCHAR)
             || '-' || CAST(CAST('0x' || substr(md5(text), 9, 8) AS BIGINT) % 1000 AS VARCHAR)
             || '-' || CAST(CAST('0x' || substr(md5(text), 17, 8) AS BIGINT) % 1000 AS VARCHAR)
             || '-' || CAST(CAST('0x' || substr(md5(text), 25, 8) AS BIGINT) % 1000 AS VARCHAR)
             AS feature_sig
    FROM documents
    """,
    survey_ops=(),
    doc="Multimodal feature extraction: binary content column → "
    "(byte_len, fingerprint, feature signature) via ONE Arrow-batched "
    "mapInPandas pass — the image/audio decode slot is a deterministic "
    "fake (md5-derived); the plumbing (schema, batching, zero-shuffle "
    "map) is the production path.",
)
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_media_features(media_from_documents(docs))


@register(
    "video_frame_sample",
    sql=f"""
    SELECT media_id, n_frames,
           unnest(generate_series(0, n_frames - 1, 10)) AS frame_idx
    FROM (
      SELECT doc_id AS media_id, CAST(doc_id % 240 + 24 AS BIGINT) AS n_frames
      FROM documents WHERE {_MEDIA_TYPE_SQL} = 'video') v
    """,
    survey_ops=(),
    doc="Frame sampling plumbing: per video, every 10th frame index "
    "materialized via sequence+explode (JVM-side, no UDF); the frame "
    "decode stage itself is the stubbed decode_video. At scale this is "
    "the fan-out stage before a batched frame-featurizer mapInPandas.",
)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = media_from_documents(docs).filter(col("media_type") == "video")
    return media.select(
        "media_id",
        col("meta.n_frames").alias("n_frames"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), col("meta.n_frames") - 1, F.lit(10).cast("long"))
        ).alias("frame_idx"),
    )


@register(
    "media_resize_thumbs",
    sql=f"""
    WITH img AS (
      SELECT doc_id AS media_id,
             CAST(doc_id % 640 + 64 AS BIGINT) AS w,
             CAST(doc_id % 480 + 48 AS BIGINT) AS h,
             upper(md5(text)) AS thumb_sig
      FROM documents WHERE {_MEDIA_TYPE_SQL} = 'image')
    SELECT media_id,
           CASE WHEN w <= 64 AND h <= 64 THEN w
                WHEN w * 64 >= h * 64 THEN 64
                ELSE GREATEST(1, (w * 64) // h) END AS width,
           CASE WHEN w <= 64 AND h <= 64 THEN h
                WHEN w * 64 >= h * 64 THEN GREATEST(1, (h * 64) // w)
                ELSE 64 END AS height,
           CAST(16 AS BIGINT) AS thumb_len,
           thumb_sig
    FROM img
    """,
    survey_ops=(),
    doc="Image resize plumbing: aspect-fit thumbnails into a 64x64 box "
    "via one Arrow-batched mapInPandas pass (operators/multimodal.py "
    "resize_images) — exact integer aspect math, content bytes never "
    "leave the executor, zero shuffle. The pixel resize slot is PIL when "
    "available and a deterministic 16-byte md5 thumbnail otherwise; the "
    "oracle checks the dims math and the thumbnail signature.",
)
def media_resize_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents")
    thumbs = resize_images(media_from_documents(docs))
    return thumbs.select(
        "media_id",
        "width",
        "height",
        F.length("thumb").cast("long").alias("thumb_len"),
        F.hex("thumb").alias("thumb_sig"),
    )


@register(
    "audio_window_energy",
    sql=f"""
    WITH a AS (
      SELECT doc_id AS media_id, text,
             octet_length(encode(text)) // 2 AS n_samples
      FROM documents WHERE {_MEDIA_TYPE_SQL} = 'audio'),
    w AS (
      SELECT media_id, text, n_samples,
             CASE WHEN n_samples < 64 THEN 0
                  ELSE 1 + (n_samples - 64) // 25 END AS n_wins
      FROM a)
    SELECT media_id, n_samples,
           CAST(i AS BIGINT) AS win_idx,
           CAST(i * 25 AS BIGINT) AS win_start,
           CAST('0x' || substr(md5(text || ':' || CAST(i AS VARCHAR)), 1, 12) AS BIGINT)
             AS energy_fp
    FROM (SELECT media_id, text, n_samples,
                 unnest(range(0, n_wins)) AS i
          FROM w WHERE n_wins > 0)
    """,
    survey_ops=(),
    doc="Audio framing: fixed windows with hop (64/25 samples over 16-bit "
    "PCM byte lengths; production uses 400/160 = 25ms/10ms at 16 kHz) "
    "plus one energy value per "
    "window, via one Arrow-batched mapInPandas pass "
    "(operators/multimodal.py::audio_window_energy). The energy slot is a "
    "deterministic md5 fake standing in for the numpy square-sum over the "
    "decoded window (no audio lib in this container); window geometry is "
    "exact integer math, so the oracle checks the full fan-out. "
    "Completes the modality triple: image resize, video frame sampling, "
    "audio windowing — all through the same binary-column + Arrow-batch "
    "plumbing. Scale shape: zero shuffle (map-only fan-out).",
)
def audio_window_energy_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_window_energy

    docs = load_table(spark, sf_dir, "documents")
    return audio_window_energy(media_from_documents(docs))
