"""Multimodal pipeline queries: binary media columns decoded for real.

No media files ship with the test data, so a media table is synthesized
deterministically from ``documents``: image rows carry REAL 24-bpp BMP
bytes (constant gray level, dimensions derived from doc_id), audio rows
carry REAL 16-bit PCM WAV bytes (square wave, amplitude/length derived
from doc_id), video rows carry opaque bytes + metadata (video codecs
genuinely need ffmpeg). The decode stage (operators/multimodal.py) parses
the actual file headers and pixel/sample payloads, so every reported
feature — width, height, mean_luma, duration_ms, rms — is computed from
the bytes, and the DuckDB oracle predicts the same values analytically
from doc_id. This closes the encode -> binary column -> Arrow batch ->
decode loop end-to-end.

Scale notes: synth and decode are both map-only stages — no shuffle until
the final ORDER BY; bytes move JVM->Python once per Arrow batch, never
per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_lunar_spark.operators import multimodal as M
from pulsar_lunar_spark.queries.registry import register
from pulsar_lunar_spark.session import ensure_parallelism, load_table

# Derivations shared (conceptually) by the python synth and the SQL oracle:
#   image: w = doc_id % 31 + 2, h = doc_id % 17 + 2, gray = doc_id % 256
#          n_bytes = 54 + ((w*3 + 3) // 4 * 4) * h      (BMP headers + padded rows)
#   audio: amp = doc_id % 1000 + 1, n = doc_id % 500 + 10, rate = 1000 Hz
#          duration_ms = n, rms = amp, n_bytes = 44 + 2*n (WAV headers + samples)

_MEDIA_SQL = """
    SELECT 'm' || doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
             AS media_type,
           doc_id,
           OCTET_LENGTH(ENCODE(text)) AS text_bytes
    FROM documents
"""


_ONLY_MOD = {"image": 0, "audio": 1, "video": 2}


def _media_df(spark: SparkSession, sf_dir: str, only: str | None = None) -> DataFrame:
    """Synthesize the media table from documents. ``only`` restricts the
    synthesis to one modality (doc_id % 3 class) BEFORE the per-row
    encode loop — a query that reads one modality shouldn't pay for
    encoding the other two (the filter is a pushed-down scan predicate;
    the oracle applies the same media_type filter)."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    if only is not None:
        d = d.filter(F.col("doc_id") % 3 == _ONLY_MOD[only])

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                if did % 3 == 0:
                    w, h, gray = did % 31 + 2, did % 17 + 2, did % 256
                    rows.append(
                        (f"m{did}", "image", M.encode_bmp(gray, w, h), "bmp", None, None, None)
                    )
                elif did % 3 == 1:
                    amp, n = did % 1000 + 1, did % 500 + 10
                    samples = np.full(n, amp, dtype=np.int16)
                    samples[1::2] *= -1  # square wave: rms == amp exactly
                    rows.append(
                        (f"m{did}", "audio", M.encode_wav(samples, rate=1000), "wav",
                         None, None, None)
                    )
                else:
                    # real uncompressed AVI: gradient frames
                    # pixel(y, x, f) = (x + y + 3f) % 256 — max 44, so the
                    # modulo is the identity and luma sums have closed form
                    w, h, n = did % 13 + 2, did % 11 + 2, did % 6 + 2
                    y, x = np.mgrid[0:h, 0:w]
                    frames = np.stack([(x + y + 3 * f) % 256 for f in range(n)])
                    rows.append(
                        (f"m{did}", "video",
                         M.encode_avi(frames.astype(np.uint8), usec_per_frame=500_000),
                         "avi", None, None, n * 500)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "content", "format",
                    "width", "height", "duration_ms",
                ],
            )

    return d.mapInPandas(_synth, schema=M.MEDIA_SCHEMA)


def _materialized(spark: SparkSession, sf_dir: str, tag: str, build) -> DataFrame:
    """Materialize a synthesized fixture DataFrame ONCE per (process, sf,
    tag) on tmpfs and re-read it on later calls — the per-row python
    encode loops are fixture builds, and re-running them on every bench
    rep measured fixture cost, not the decode operator under test.
    Binary content round-trips parquet losslessly, so the decode stage
    sees byte-identical input either way. The per-pid dir registers for
    removal at process exit (session.scratch_at_exit)."""
    import os

    from pulsar_lunar_spark.session import scratch_root

    base = scratch_root("pulsar_lunar_media", sf_dir)
    path = os.path.join(base, tag)
    marker = os.path.join(path, "_SYNTHED")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        build().write.mode("overwrite").parquet(path)
        open(marker, "w").close()
    return spark.read.parquet(path)


def _media_table(spark: SparkSession, sf_dir: str, only: str | None = None) -> DataFrame:
    return _materialized(
        spark, sf_dir, only or "all", lambda: _media_df(spark, sf_dir, only=only)
    )


@register(
    "q_media_image_features",
    oracle=f"""
    WITH media AS ({_MEDIA_SQL})
    SELECT media_id,
           CAST(54 + ((doc_id % 31 + 2) * 3 + 3) // 4 * 4 * (doc_id % 17 + 2) AS BIGINT)
               AS n_bytes,
           CAST(doc_id % 31 + 2 AS INT) AS width,
           CAST(doc_id % 17 + 2 AS INT) AS height,
           ROUND(CAST(doc_id % 256 AS DOUBLE), 4) AS mean_luma,
           TRUE AS decode_ok
    FROM media WHERE media_type = 'image'
    ORDER BY media_id
    """,
    tags=("multimodal", "image", "map-in-pandas"),
)
def q_media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode over binary columns: synthesized 24-bpp BMPs are
    header-parsed and pixel-averaged in the mapInPandas stage; the oracle
    recomputes width/height/mean_luma/file-size analytically from doc_id —
    a wrong byte anywhere in encode or decode turns the row red."""
    feats = M.image_features(_media_table(spark, sf_dir, only="image"))
    return feats.select(
        "media_id", "n_bytes", "width", "height",
        F.round("mean_luma", 4).alias("mean_luma"), "decode_ok",
    ).orderBy("media_id")


@register(
    "q_media_png_features",
    oracle=f"""
    WITH media AS ({_MEDIA_SQL})
    SELECT media_id,
           CAST(doc_id % 31 + 2 AS INT) AS width,
           CAST(doc_id % 17 + 2 AS INT) AS height,
           ROUND(CAST(doc_id % 256 AS DOUBLE), 4) AS mean_luma,
           TRUE AS decode_ok
    FROM media WHERE media_type = 'image'
    ORDER BY media_id
    """,
    tags=("multimodal", "image", "png", "map-in-pandas"),
)
def q_media_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode over binary columns: constant-gray PNGs encoded with
    CYCLING scanline filters (None/Sub/Up/Average/Paeth across rows), so
    the decode stage must run the genuine zlib inflate + every unfilter
    path to recover the gray level — any filter bug shifts mean_luma and
    turns the row red. Dimensions/means have exact analytic oracle twins.
    (PNG container size is zlib-dependent, so unlike BMP no n_bytes
    formula is asserted.)"""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents")).select("doc_id")
    d = d.filter(F.col("doc_id") % 3 == 0)

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h, gray = did % 31 + 2, did % 17 + 2, did % 256
                png = M.encode_png(np.full((h, w), gray, dtype=np.uint8))
                rows.append((f"m{did}", "image", png, "png", None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "content", "format",
                    "width", "height", "duration_ms",
                ],
            )

    png_tbl = _materialized(
        spark, sf_dir, "png", lambda: d.mapInPandas(_synth, schema=M.MEDIA_SCHEMA)
    )
    feats = M.image_features(png_tbl)
    return feats.select(
        "media_id", "width", "height",
        F.round("mean_luma", 4).alias("mean_luma"), "decode_ok",
    ).orderBy("media_id")


@register(
    "q_media_jpeg_features",
    oracle=f"""
    WITH media AS ({_MEDIA_SQL})
    SELECT media_id,
           CAST(doc_id % 31 + 2 AS INT) AS width,
           CAST(doc_id % 17 + 2 AS INT) AS height,
           TRUE AS luma_ok,
           TRUE AS decode_ok
    FROM media WHERE media_type = 'image'
    ORDER BY media_id
    """,
    tags=("multimodal", "image", "jpeg", "map-in-pandas"),
)
def q_media_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decode (operators/jpeg.py — 8x8 DCT, quantization,
    canonical Huffman, byte unstuffing; tables reconstructed from the
    file's own DQT/DHT segments): constant-gray JPEGs decode to dimensions
    exactly and mean luma within the DC quantization bound (±1 gray level
    — JPEG is lossy, so the luma check is a bound, not an equality)."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents")).select("doc_id")
    d = d.filter(F.col("doc_id") % 3 == 0)

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pulsar_lunar_spark.operators.jpeg import encode_jpeg

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h, gray = did % 31 + 2, did % 17 + 2, did % 256
                jpg = encode_jpeg(np.full((h, w), gray, dtype=np.uint8))
                rows.append((f"m{did}", "image", jpg, "jpeg", None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "content", "format",
                    "width", "height", "duration_ms",
                ],
            )

    jpg_tbl = _materialized(
        spark, sf_dir, "jpeg", lambda: d.mapInPandas(_synth, schema=M.MEDIA_SCHEMA)
    )
    feats = M.image_features(jpg_tbl)
    gray = (F.regexp_extract("media_id", r"m(\d+)", 1).cast("long") % 256).cast(
        "double"
    )
    return feats.select(
        "media_id", "width", "height",
        (F.abs(F.col("mean_luma") - gray) <= 1.0).alias("luma_ok"),
        "decode_ok",
    ).orderBy("media_id")


@register(
    "q_media_transcode",
    oracle=f"""
    WITH media AS ({_MEDIA_SQL})
    SELECT media_id,
           CAST(8 AS INT) AS out_width,
           CAST(8 AS INT) AS out_height,
           TRUE AS luma_ok,
           TRUE AS transcode_ok
    FROM media WHERE media_type = 'image'
    ORDER BY media_id
    """,
    tags=("multimodal", "image", "transcode", "map-in-pandas"),
)
def q_media_transcode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image transcode pipeline: color PNG in (zlib decode + full
    unfilter) -> nearest-neighbor resize to 8x8 -> baseline JPEG out
    (DCT + Huffman encode) -> JPEG decode to verify. Constant-color
    inputs survive the whole lossy chain within the JPEG DC bound, so
    the luma flag fails if ANY stage — either codec's encode or decode,
    or the resample — corrupts a byte. Map-only stage, bytes cross
    JVM->Python once per Arrow batch."""
    from pulsar_lunar_spark.operators.jpeg import decode_jpeg_pixels, encode_jpeg

    d = ensure_parallelism(load_table(spark, sf_dir, "documents")).select("doc_id")
    d = d.filter(F.col("doc_id") % 3 == 0)

    def _synth_png(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = did % 31 + 2, did % 17 + 2
                rgb = np.zeros((h, w, 3), dtype=np.uint8)
                rgb[:, :, 0] = did % 256
                rgb[:, :, 1] = (did * 7) % 256
                rgb[:, :, 2] = (did * 13) % 256
                rows.append((f"m{did}", M.encode_png(rgb)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    # fixture (the color-PNG encode loop) materialized per process; the
    # transcode stage under test — PNG decode -> NN resize -> JPEG encode
    # -> JPEG decode — reads the stored bytes and re-derives the expected
    # color from the media id
    fix = _materialized(
        spark,
        sf_dir,
        "png_color",
        lambda: d.mapInPandas(_synth_png, schema="media_id string, content binary"),
    )

    def _transcode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, png in zip(pdf["media_id"], pdf["content"]):
                did = int(mid[1:])
                rgb = np.zeros((1, 1, 3), dtype=np.uint8)
                rgb[:, :, 0] = did % 256
                rgb[:, :, 1] = (did * 7) % 256
                rgb[:, :, 2] = (did * 13) % 256
                src = M.decode_png_pixels(bytes(png))
                yi = (np.arange(8) * src.shape[0]) // 8
                xi = (np.arange(8) * src.shape[1]) // 8
                thumb = src[np.ix_(yi, xi)]
                jpg = encode_jpeg(thumb)
                dec = decode_jpeg_pixels(jpg)
                # chroma DC quant step is 17, so a constant color can move
                # up to ceil(17/2/1.772)≈5 in a channel after the inverse
                # color transform; 6 is the honest bound (worst measured
                # over the whole doc_id color space: 4)
                luma_ok = bool(
                    np.abs(dec.astype(np.int64) - rgb[0, 0].astype(np.int64))
                    .max() <= 6
                )
                rows.append(
                    (f"m{did}", dec.shape[1], dec.shape[0], luma_ok,
                     dec.shape == (8, 8, 3))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "out_width", "out_height", "luma_ok", "transcode_ok",
                ],
            )

    out = fix.mapInPandas(
        _transcode,
        schema=(
            "media_id string, out_width int, out_height int, "
            "luma_ok boolean, transcode_ok boolean"
        ),
    )
    return out.orderBy("media_id")


@register(
    "q_media_audio_features",
    oracle=f"""
    WITH media AS ({_MEDIA_SQL})
    SELECT media_id,
           CAST(44 + 2 * (doc_id % 500 + 10) AS BIGINT) AS n_bytes,
           CAST(doc_id % 500 + 10 AS INT) AS duration_ms,
           ROUND(CAST(doc_id % 1000 + 1 AS DOUBLE), 4) AS rms,
           TRUE AS decode_ok
    FROM media WHERE media_type = 'audio'
    ORDER BY media_id
    """,
    tags=("multimodal", "audio", "map-in-pandas"),
)
def q_media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode: synthesized PCM WAVs (1 kHz square wave) are
    RIFF-chunk-walked and sample-RMS'd in the mapInPandas stage; duration
    and rms have exact analytic twins in the oracle."""
    feats = M.audio_features(_media_table(spark, sf_dir, only="audio"))
    return feats.select(
        "media_id", "n_bytes", "duration_ms",
        F.round("rms", 4).alias("rms"), "decode_ok",
    ).orderBy("media_id")


@register(
    "q_media_audio_mulaw",
    oracle=f"""
    WITH media AS ({_MEDIA_SQL}),
    p AS (
        SELECT media_id,
               doc_id % 1000 + 1 AS amp,
               doc_id % 500 + 10 AS n
        FROM media WHERE media_type = 'audio'
    ), mu AS (
        SELECT media_id, amp, n,
               LEAST(GREATEST(CAST(FLOOR(LOG2(LEAST(amp, 32635) + 132)) AS INT) - 7,
                              0), 7) AS e
        FROM p
    )
    SELECT media_id,
           CAST(44 + n AS BIGINT) AS n_bytes,
           CAST(n AS INT) AS duration_ms,
           ROUND(CAST(((((((LEAST(amp, 32635) + 132) >> (e + 3)) & 15) * 8 + 132)
                        * (1 << e)) - 132) AS DOUBLE), 4) AS rms,
           TRUE AS decode_ok
    FROM mu ORDER BY media_id
    """,
    tags=("multimodal", "audio", "mulaw", "map-in-pandas"),
)
def q_media_audio_mulaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL G.711 mu-law audio: square waves companded to 8-bit mu-law
    codes (fmt tag 7), RIFF-walked and EXPANDED back in the decode stage.
    Companding is deterministic integer math — sign, 3-bit exponent
    segment, 4-bit mantissa — so the oracle replicates the entire
    encode->decode round trip in SQL and the reported RMS is value-exact
    (a square wave's RMS is the expanded magnitude itself)."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents")).select("doc_id")
    d = d.filter(F.col("doc_id") % 3 == 1)

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                amp, n = did % 1000 + 1, did % 500 + 10
                samples = np.full(n, amp, dtype=np.int16)
                samples[1::2] *= -1
                rows.append(
                    (f"m{did}", "audio", M.encode_wav_mulaw(samples, rate=1000),
                     "wav", None, None, None)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "content", "format",
                    "width", "height", "duration_ms",
                ],
            )

    tbl = _materialized(
        spark, sf_dir, "mulaw", lambda: d.mapInPandas(_synth, schema=M.MEDIA_SCHEMA)
    )
    feats = M.audio_features(tbl)
    return feats.select(
        "media_id", "n_bytes", "duration_ms",
        F.round("rms", 4).alias("rms"), "decode_ok",
    ).orderBy("media_id")


@register(
    "q_media_frame_sample",
    oracle=f"""
    WITH vid AS (
      SELECT media_id,
             doc_id % 13 + 2 AS w, doc_id % 11 + 2 AS h, doc_id % 6 + 2 AS n
      FROM ({_MEDIA_SQL}) WHERE media_type = 'video'
    )
    SELECT media_id,
           CAST(j AS INT) AS frame_index,
           CAST(j * 1000 AS INT) AS frame_ms,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(h * (w * (w - 1)) // 2 + w * (h * (h - 1)) // 2
                + 3 * (2 * j) * w * h AS BIGINT) AS luma_sum,
           TRUE AS decode_ok
    FROM (
      SELECT media_id, w, h, n,
             UNNEST(RANGE(0, (n - 1) // 2 + 1)) AS j
      FROM vid
    )
    ORDER BY media_id, frame_index
    """,
    tags=("multimodal", "video", "fanout", "decode"),
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling: gradient videos are packed as genuine
    uncompressed RIFF AVI containers (multimodal.encode_avi — 24-bpp DIB
    '00db' frames, 2 fps), then mapInPandas decodes the container
    (decode_avi: RIFF chunk walk + DIB unpack), samples one frame per
    second (every 2nd frame), and emits each sampled frame's decoded
    dimensions + exact integer luma sum.

    The oracle is the closed form of the gradient: pixel(y,x,f) =
    x + y + 3f (all < 256, so no modulo), hence luma_sum(f) =
    h·w(w−1)/2 + w·h(h−1)/2 + 3f·w·h with f = 2j — any mis-parse of the
    container (row padding, bottom-up order, chunk offsets) breaks the
    hash. Compressed codecs still raise honestly (ffmpeg territory)."""
    frames = M.sample_avi_frames(_media_table(spark, sf_dir, only="video"), every_ms=1000)
    return frames.select(
        "media_id", "frame_index", "frame_ms", "width", "height",
        "luma_sum", "decode_ok",
    ).orderBy("media_id", "frame_index")


@register(
    "q_media_resize",
    oracle="""
    WITH img AS (
        SELECT 'm' || doc_id AS media_id,
               doc_id % 31 + 2 AS w, doc_id % 17 + 2 AS h
        FROM documents WHERE doc_id % 3 = 0
    )
    SELECT media_id,
           8 AS out_width, 8 AS out_height,
           CAST(246 AS BIGINT) AS n_bytes,
           CAST((SELECT SUM(((j * img.w) // 8 + (i * img.h) // 8) % 256)
                 FROM UNNEST(GENERATE_SERIES(0, 7)) u(i),
                      UNNEST(GENERATE_SERIES(0, 7)) v(j)) AS BIGINT) AS luma_sum,
           TRUE AS decode_ok
    FROM img ORDER BY media_id
    """,
    tags=("multimodal", "image", "resize"),
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize: gradient BMPs (pixel(y,x) = (x+y) mod 256 —
    orientation-sensitive, so a row-flip bug anywhere in the codec turns
    every row red) are decoded, nearest-neighbor-resampled to 8x8,
    re-encoded, and the reported luma_sum is decoded from the RESIZED
    bytes. The oracle replays the exact NN index math ((i*h)//8,
    (j*w)//8) analytically — integer arithmetic end to end, no float
    anywhere. 246 = 54 header bytes + 24-byte padded rows * 8."""
    d = ensure_parallelism(
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 3 == 0)
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = did % 31 + 2, did % 17 + 2
                grad = (np.add.outer(np.arange(h), np.arange(w)) % 256).astype(np.uint8)
                rows.append((f"m{did}", M.encode_bmp(grad)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    # fixture (the gradient BMP encode loop) materialized per process;
    # the resize operator under test reads the stored bytes
    imgs = _materialized(
        spark,
        sf_dir,
        "bmp_grad",
        lambda: d.mapInPandas(_synth, schema="media_id string, content binary"),
    )
    return M.resize_images(imgs, out_w=8, out_h=8).orderBy("media_id")
