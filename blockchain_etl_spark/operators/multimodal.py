"""Multimodal column operators — image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the actual byte→pixels/samples
decode is STUBBED (``decode_image``/``decode_audio``/``decode_video`` raise
``NotImplementedError`` unless PIL/soundfile/av are importable). Everything
around the decode — the media table schema, the ``mapInPandas`` batch
signature, the feature-extraction pipeline shape, deterministic
fingerprinting — is real and tested; swapping the fake ``_feature_from_bytes``
for a real decoder changes no Spark-side plumbing.

Scale notes: content bytes never leave the executor (no collect); feature
extraction is one ``mapInPandas`` pass (Arrow batches, zero shuffle); at
100 TB the media table would be partitioned by ``media_type`` so per-type
pipelines prune partitions at the source.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# media table: binary payload + discriminator + per-type metadata (sparse
# struct — NULL fields for non-applicable types), mirroring how the
# reference keeps one polymorphic `fields` payload per transaction type.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", LongType()),
                    StructField("height", LongType()),
                    StructField("sample_rate", LongType()),
                    StructField("n_frames", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("fp", LongType()),
        StructField("feature_sig", StringType()),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize the media table from `documents` (deterministic): content
    is the utf-8 text bytes, type cycles by id, metadata derives from id."""
    t = F.col("media_type")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
    ).select(
        "media_id",
        "media_type",
        "content",
        F.struct(
            F.when(t == "image", F.col("media_id") % 640 + 64).alias("width"),
            F.when(t == "image", F.col("media_id") % 480 + 48).alias("height"),
            F.when(t == "audio", F.lit(16000)).alias("sample_rate"),
            F.when(t == "video", F.col("media_id") % 240 + 24).alias("n_frames"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Decoders — STUBS. Real decoding requires libraries not present in this
# container; each is gated behind an import-try and otherwise raises.
# ---------------------------------------------------------------------------

try:  # pragma: no cover
    from PIL import Image as _PIL_Image  # type: ignore

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def decode_image(content: bytes):  # pragma: no cover - stub
    """bytes → pixel array. STUB: requires PIL, not in this container."""
    if not HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; deterministic fake features are used "
            "in extract_media_features instead"
        )
    import io

    return _PIL_Image.open(io.BytesIO(content))


def decode_audio(content: bytes):  # pragma: no cover - stub
    """bytes → sample array. STUB: no audio library in this container."""
    raise NotImplementedError("audio decode requires soundfile/librosa")


def decode_video(content: bytes):  # pragma: no cover - stub
    """bytes → frame iterator. STUB: no av/ffmpeg in this container."""
    raise NotImplementedError("video decode requires av/ffmpeg")


def _feature_from_bytes(content: bytes) -> tuple[int, str]:
    """Deterministic fake 'decode + feature extraction': md5-derived 32-bit
    fingerprint and a 4-slot feature signature (scaled ints, engine-exact).
    Stands in for (decode → embed) while keeping the dataflow identical."""
    h = hashlib.md5(content).hexdigest()
    fp = int(h[:8], 16)
    sig = "-".join(str(int(h[8 * i : 8 * i + 8], 16) % 1000) for i in range(4))
    return fp, sig


def extract_media_features(media: DataFrame) -> DataFrame:
    """media(media_id, media_type, content, meta) → per-item features via
    one Arrow-batched ``mapInPandas`` pass (the multimodal hot path).

    The pandas iterator signature, output schema, and batch handling are the
    production plumbing; only `_feature_from_bytes` is a deterministic fake
    standing in for decode_image/decode_audio/decode_video.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _feature_from_bytes(bytes(c)) for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["content"].map(lambda b: len(bytes(b))),
                    "fp": [f[0] for f in feats],
                    "feature_sig": [f[1] for f in feats],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("thumb", BinaryType()),
    ]
)


def _fit_box(w: int, h: int, box_w: int, box_h: int) -> tuple[int, int]:
    """Aspect-preserving fit of (w, h) into (box_w, box_h), never
    upscaling — exact integer arithmetic (cross-engine reproducible)."""
    if w <= box_w and h <= box_h:
        return w, h
    if w * box_h >= h * box_w:  # width-bound
        return box_w, max(1, (h * box_w) // w)
    return max(1, (w * box_h) // h), box_h


def resize_images(media: DataFrame, box_w: int = 64, box_h: int = 64) -> DataFrame:
    """image rows → aspect-fit thumbnails via ONE Arrow-batched
    ``mapInPandas`` pass (zero shuffle; content bytes stay on executors).

    Real path: decode_image + PIL thumbnail when PIL is importable.
    Fallback (this container): target dims via the same exact integer
    aspect math, and a deterministic 16-byte md5 'thumbnail' standing in
    for the pixel payload — swapping in the real decoder changes no
    Spark-side plumbing, schema, or partitioning.
    """
    flat = media.filter(F.col("media_type") == "image").select(
        "media_id",
        "content",
        F.col("meta.width").alias("w"),
        F.col("meta.height").alias("h"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [
                _fit_box(int(w), int(h), box_w, box_h)
                for w, h in zip(pdf["w"], pdf["h"])
            ]
            if HAS_PIL:  # pragma: no cover - real decoder path
                thumbs = []
                for c, (tw, th) in zip(pdf["content"], dims):
                    img = decode_image(bytes(c))
                    img.thumbnail((tw, th))
                    thumbs.append(img.tobytes())
            else:
                thumbs = [
                    hashlib.md5(bytes(c)).digest() for c in pdf["content"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "thumb": thumbs,
                }
            )

    return flat.mapInPandas(batches, schema=RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Audio windowing — the framing stage of every audio featurizer
# (spectrogram / MFCC / VAD): fixed-size windows with hop, one energy
# value per window. Window geometry is exact integer math; the per-window
# energy slot is a deterministic md5 fake (no audio decode lib in this
# container) computed INSIDE the Arrow batch loop, standing in for
# `numpy.square(samples[start:start+win]).sum()`.
# ---------------------------------------------------------------------------
AUDIO_WIN = 64  # window sized to the synthetic clips (same 2.5:1 win:hop as 400/160)
AUDIO_HOP = 25

AUDIO_WINDOW_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("win_idx", LongType()),
        StructField("win_start", LongType()),
        StructField("energy_fp", LongType()),
    ]
)


def audio_window_energy(media: DataFrame, win: int = AUDIO_WIN, hop: int = AUDIO_HOP) -> DataFrame:
    """audio rows → one row per (window, energy) via Arrow-batched
    mapInPandas. n_samples = byte_len div 2 (16-bit PCM framing);
    windows cover [i*hop, i*hop+win) for i in [0, 1 + (n-win) div hop)."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("media_id", "n_samples", "win_idx", "win_start", "energy_fp")}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                n = len(raw) // 2
                n_wins = 0 if n < win else 1 + (n - win) // hop
                text = raw.decode("utf-8")
                for i in range(n_wins):
                    out["media_id"].append(mid)
                    out["n_samples"].append(n)
                    out["win_idx"].append(i)
                    out["win_start"].append(i * hop)
                    # deterministic fake for sum(samples[s:s+win]^2)
                    h = hashlib.md5(f"{text}:{i}".encode()).hexdigest()
                    out["energy_fp"].append(int(h[:12], 16))
            yield pd.DataFrame(out)

    return media.filter(media.media_type == "audio").mapInPandas(
        batches, schema=AUDIO_WINDOW_SCHEMA
    )
