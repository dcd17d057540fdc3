"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(SURVEY north-star ops; BASELINE.json "multimodal columns").

Design for 100 TB: media bytes ride as a ``binary`` column next to typed
metadata; decode/feature-extract runs partition-wise via ``mapInPandas``
(iterator of Arrow batches — bytes never cross a Python row boundary).
Partitioning discipline: media tables are written with
``maxRecordsPerFile`` tuned so (rows x avg_media_size) fits an executor;
the decode stage is a map-only stage — no shuffle.

The actual codec calls (PIL/ffmpeg/soundfile) are STUBBED: this container
has no media libraries. Each stub either raises NotImplementedError (real
codec path) or produces a deterministic fake (test path) — the Spark-side
schema, UDF signature and batch shape are real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media column group: bytes + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("format", StringType()),  # png/jpeg/wav/mp4/...
        StructField("width", IntegerType()),  # images/video
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),  # audio/video
    ]
)

#: Output schema of the image feature extractor.
IMAGE_FEATURES_SCHEMA = (
    "media_id string, format string, n_bytes long, width int, height int, "
    "mean_luma double, decode_ok boolean"
)

#: Output schema of the audio feature extractor.
AUDIO_FEATURES_SCHEMA = (
    "media_id string, format string, n_bytes long, duration_ms int, "
    "rms double, decode_ok boolean"
)

#: Output schema of video frame sampling.
FRAME_SAMPLE_SCHEMA = (
    "media_id string, frame_index int, frame_ms int, frame bytes"
).replace("bytes", "binary")


def _decode_image_stub(content: bytes, fmt: str) -> tuple[int, int, float]:
    """STUB decode (no PIL in this container): deterministic fake — derives
    (width, height, mean_luma) from the byte content so tests are stable.
    A real deployment replaces this body with PIL.Image.open."""
    if fmt not in ("png", "jpeg", "fake"):
        raise NotImplementedError(f"image codec '{fmt}' requires PIL (not in container)")
    h = len(content)
    return (h % 640 + 1, h % 480 + 1, float(sum(content[:64]) % 256) if content else 0.0)


def _decode_audio_stub(content: bytes, fmt: str) -> tuple[int, float]:
    """STUB decode (no soundfile/ffmpeg): deterministic (duration_ms, rms)."""
    if fmt not in ("wav", "fake"):
        raise NotImplementedError(f"audio codec '{fmt}' requires soundfile (not in container)")
    return (len(content) * 8, float((content[0] if content else 0) / 255.0))


def image_features(df: DataFrame) -> DataFrame:
    """Partition-wise image decode + feature extraction over MEDIA_SCHEMA
    columns. mapInPandas: bytes arrive as Arrow binary arrays, one batch at
    a time — the scalable multimodal pattern."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None else b""
                try:
                    w, h, luma = _decode_image_stub(content, r["format"])
                    ok = True
                except NotImplementedError:
                    w = h = -1
                    luma = float("nan")
                    ok = False
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "format": r["format"],
                        "n_bytes": len(content),
                        "width": w,
                        "height": h,
                        "mean_luma": luma,
                        "decode_ok": ok,
                    }
                )
            yield pd.DataFrame(rows)

    return df.filter(F.col("media_type") == "image").mapInPandas(
        _extract, schema=IMAGE_FEATURES_SCHEMA
    )


def audio_features(df: DataFrame) -> DataFrame:
    """Partition-wise audio decode + features (rms, duration)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None else b""
                try:
                    dur, rms = _decode_audio_stub(content, r["format"])
                    ok = True
                except NotImplementedError:
                    dur, rms, ok = -1, float("nan"), False
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "format": r["format"],
                        "n_bytes": len(content),
                        "duration_ms": dur,
                        "rms": rms,
                        "decode_ok": ok,
                    }
                )
            yield pd.DataFrame(rows)

    return df.filter(F.col("media_type") == "audio").mapInPandas(
        _extract, schema=AUDIO_FEATURES_SCHEMA
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    STUB: frames are deterministic byte slices of the source (a real
    deployment decodes with ffmpeg). The fan-out shape (1 video row ->
    N frame rows out of mapInPandas) is the real, tested contract.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None else b""
                dur = int(r["duration_ms"]) if r["duration_ms"] is not None else 0
                for i, ms in enumerate(range(0, max(dur, 1), every_ms)):
                    lo = (i * 16) % max(len(content), 1)
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_index": i,
                            "frame_ms": ms,
                            "frame": content[lo : lo + 16],
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_index", "frame_ms", "frame"])

    return df.filter(F.col("media_type") == "video").mapInPandas(
        _sample, schema=FRAME_SAMPLE_SCHEMA
    )


def with_media_stats(df: DataFrame) -> DataFrame:
    """JVM-side media stats that need no decode: byte size, format counts —
    always prefer these (free at scan speed) before any Python decode."""
    return df.withColumn("n_bytes", F.length("content")).withColumn(
        "has_content", F.col("content").isNotNull() & (F.length("content") > 0)
    )
