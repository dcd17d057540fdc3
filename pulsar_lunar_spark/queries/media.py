"""Multimodal pipeline queries: binary media columns + mapInPandas decode
stubs, oracle-checked on the deterministic parts.

No media files ship with the test data, so a media table is synthesized
deterministically from ``documents``: content = utf-8 bytes of the text,
media_type round-robins image/audio/video by doc_id. The decode stubs
derive their outputs from byte lengths (multimodal.py), so n_bytes / width
/ height / duration_ms / frame fan-out have exact DuckDB twins
(OCTET_LENGTH(ENCODE(text))); the byte-content-derived fields (mean_luma,
rms, frame bytes) are covered by tests/test_multimodal.py instead.

Scale notes: the synth projection and the decode are both map-only stages —
no shuffle until the final ORDER BY; bytes move JVM→Python once per Arrow
batch, never per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_lunar_spark.operators import multimodal as M
from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import ensure_parallelism, load_table

_MEDIA_SQL = """
    SELECT 'm' || doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
             AS media_type,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes
    FROM documents
"""


def _media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return d.select(
        F.concat(F.lit("m"), F.col("doc_id")).alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.lit("fake").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        # pre-decode metadata (as a real media table would carry): bounded so
        # frame sampling fans out to <= 5 frames per video
        (F.length(F.encode("text", "utf-8")) % 4000 + 1).cast("int").alias("duration_ms"),
    )


@register(
    "q_media_image_features",
    oracle=f"""
    WITH media AS ({_MEDIA_SQL})
    SELECT media_id, n_bytes,
           CAST(n_bytes % 640 + 1 AS INT) AS width,
           CAST(n_bytes % 480 + 1 AS INT) AS height,
           TRUE AS decode_ok
    FROM media WHERE media_type = 'image'
    ORDER BY media_id
    """,
    tags=("multimodal", "image", "map-in-pandas"),
)
def q_media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode + feature extraction over binary columns (stub codec:
    dimensions derive from byte length — the mapInPandas batch plumbing is
    the real thing; cites /root/reference's opaque payload model,
    src/message/codec.rs:17-21)."""
    feats = M.image_features(_media_df(spark, sf_dir))
    return feats.select("media_id", "n_bytes", "width", "height", "decode_ok").orderBy(
        "media_id"
    )


@register(
    "q_media_audio_features",
    oracle=f"""
    WITH media AS ({_MEDIA_SQL})
    SELECT media_id, n_bytes,
           CAST(n_bytes * 8 AS INT) AS duration_ms,
           TRUE AS decode_ok
    FROM media WHERE media_type = 'audio'
    ORDER BY media_id
    """,
    tags=("multimodal", "audio", "map-in-pandas"),
)
def q_media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode + features (stub codec: duration derives from byte
    length); same Arrow-batched mapInPandas path as images."""
    feats = M.audio_features(_media_df(spark, sf_dir))
    return feats.select("media_id", "n_bytes", "duration_ms", "decode_ok").orderBy(
        "media_id"
    )


@register(
    "q_media_frame_sample",
    oracle=f"""
    WITH media AS (
      SELECT media_id, n_bytes % 4000 + 1 AS duration_ms
      FROM ({_MEDIA_SQL}) WHERE media_type = 'video'
    )
    SELECT media_id,
           CAST(i AS INT) AS frame_index,
           CAST(i * 1000 AS INT) AS frame_ms
    FROM (
      SELECT media_id,
             UNNEST(RANGE(0, CAST(CEIL(GREATEST(duration_ms, 1) / 1000.0) AS BIGINT))) AS i
      FROM media
    )
    ORDER BY media_id, frame_index
    """,
    tags=("multimodal", "video", "fanout"),
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: 1 video row fans out to N frame rows from
    mapInPandas (1 frame per second of metadata duration)."""
    frames = M.sample_frames(_media_df(spark, sf_dir), every_ms=1000)
    return frames.select("media_id", "frame_index", "frame_ms").orderBy(
        "media_id", "frame_index"
    )
