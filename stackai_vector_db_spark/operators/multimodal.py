"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

North-star LLM-pipeline operators (BASELINE.json): at 100 TB, media sits in
parquet/iceberg as binary blobs with a struct of metadata; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched Python
over ``mapInPandas`` (the only place Python belongs — per-batch vectorized
work on opaque bytes that no built-in expression can touch).

The decode kernels themselves are STUBBED here (no PIL/ffmpeg in this
environment, and none may be installed): ``_decode_image_real`` raises
``NotImplementedError`` and the pipeline uses a deterministic fake decoder
driven by the payload bytes, so the Spark-side plumbing — schema, batch
iteration, partition behavior, output contract — is fully real and tested.

Schema contract:
    media(media_id BIGINT, kind STRING, payload BINARY,
          meta STRUCT<width INT, height INT, format STRING, duration_ms INT>)
    image_features(media_id BIGINT, width INT, height INT,
                   mean_luma DOUBLE, feature ARRAY<FLOAT>)
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, format:string, duration_ms:int>"
)

IMAGE_FEATURE_SCHEMA = (
    "media_id long, width int, height int, mean_luma double, feature array<float>"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_ms int, frame_payload binary"


def make_fake_media(spark: SparkSession, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic synthetic media table: payload bytes derived from the
    id (stable across runs — usable in assertions)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes((i * 31 + j * 7) % 256 for j in range(128))
        meta = (64 + (i % 8) * 16, 48 + (i % 6) * 16, "fake", 1000 + i * 40)
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(partitions)


def _decode_image_real(payload: bytes) -> "object":
    """Real decoder hook (PIL/libjpeg). Not available in this environment —
    a deployment installs the codec libs on executors and swaps this in."""
    raise NotImplementedError(
        "image codec libraries are not installed; use fake_decode=True"
    )


def _fake_luma(payload: bytes) -> float:
    """Deterministic stand-in for decode→grayscale-mean: byte mean / 255."""
    return (sum(payload) / len(payload)) / 255.0 if payload else 0.0


def extract_image_features(
    media: DataFrame, feature_dim: int = 8, fake_decode: bool = True
) -> DataFrame:
    """Decode + feature-extract images via Arrow-batched ``mapInPandas``.

    Filter to kind='image' is pushed *before* the Python stage so non-image
    bytes never cross the JVM→Arrow boundary.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {
                "media_id": pdf["media_id"],
                "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
            }
            if fake_decode:
                lumas = pdf["payload"].map(lambda p: _fake_luma(bytes(p)))
            else:  # pragma: no cover - requires codec libs
                lumas = pdf["payload"].map(lambda p: _decode_image_real(bytes(p)))
            out["mean_luma"] = lumas.astype("float64")
            out["feature"] = [
                [round(luma * (j + 1) % 1.0, 6) for j in range(feature_dim)]
                for luma in lumas
            ]
            yield pd.DataFrame(out)

    images = media.filter(F.col("kind") == "image").select("media_id", "payload", "meta")
    return images.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, width int, height int, payload binary"
)

AUDIO_FEATURE_SCHEMA = (
    "media_id long, duration_ms int, rms double, feature array<float>"
)


def resize_images(
    media: DataFrame, width: int = 32, height: int = 32, fake_decode: bool = True
) -> DataFrame:
    """Resize: decode → scale → re-encode per batch. The fake kernel
    deterministically downsamples payload bytes to width·height
    (stride-sampled), so output size, schema, and batch behavior match a
    real codec path exactly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out_payloads = []
            for p in pdf["payload"]:
                if not fake_decode:  # pragma: no cover - requires codec libs
                    _decode_image_real(bytes(p))
                b = bytes(p)
                n = max(width * height // 64, 1)  # fake "pixel" budget
                stride = max(len(b) // n, 1)
                out_payloads.append(b[::stride][:n])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": out_payloads,
                }
            )

    images = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return images.mapInPandas(run, schema=RESIZED_SCHEMA)


def extract_audio_features(
    media: DataFrame, feature_dim: int = 8, fake_decode: bool = True
) -> DataFrame:
    """Audio features (RMS + banded energies). Fake kernel: byte-level RMS
    and per-band means over equal payload slices — deterministic, same
    shapes as a real DSP path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            recs = []
            for _, row in pdf.iterrows():
                if not fake_decode:  # pragma: no cover - requires audio libs
                    raise NotImplementedError("audio codec not installed")
                b = bytes(row["payload"])
                dur = int(row["meta"]["duration_ms"])
                rms = (sum(x * x for x in b) / len(b)) ** 0.5 / 255.0 if b else 0.0
                step = max(len(b) // feature_dim, 1)
                bands = [
                    round(sum(b[i : i + step]) / (255.0 * max(len(b[i : i + step]), 1)), 6)
                    for i in range(0, step * feature_dim, step)
                ][:feature_dim]
                bands += [0.0] * (feature_dim - len(bands))
                recs.append((int(row["media_id"]), dur, round(rms, 6), bands))
            yield pd.DataFrame(
                recs, columns=["media_id", "duration_ms", "rms", "feature"]
            )

    audio = media.filter(F.col("kind") == "audio").select(
        "media_id", "payload", "meta"
    )
    return audio.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 500, fake_decode: bool = True
) -> DataFrame:
    """Frame sampling for video payloads: one row per sampled frame.
    Real implementation seeks the container at each timestamp; the fake
    slices payload bytes deterministically (schema/row-fanout identical)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                if not fake_decode:  # pragma: no cover - requires ffmpeg
                    raise NotImplementedError("video codec not installed")
                duration = int(row["meta"]["duration_ms"])
                payload = bytes(row["payload"])
                for idx, t in enumerate(range(0, duration, every_ms)):
                    lo = (idx * 16) % max(len(payload) - 16, 1)
                    recs.append(
                        (int(row["media_id"]), idx, t, payload[lo : lo + 16])
                    )
            if recs:
                yield pd.DataFrame(
                    recs, columns=["media_id", "frame_idx", "frame_ms", "frame_payload"]
                )

    videos = media.filter(F.col("kind") == "video").select("media_id", "payload", "meta")
    return videos.mapInPandas(run, schema=FRAME_SCHEMA)
