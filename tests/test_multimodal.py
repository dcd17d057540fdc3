"""Multimodal plumbing tests: binary columns + metadata through mapInPandas
(decode stubbed — the schema/batch-shape/fan-out contracts are real)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_lunar_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    image_features,
    sample_frames,
    with_media_stats,
)


def _media_df(spark):
    rows = [
        ("img1", "image", b"\x89PNG" + bytes(range(100)), "png", None, None, None),
        ("img2", "image", bytes(range(200)), "jpeg", None, None, None),
        ("img3", "image", b"\x00\x01", "tiff", None, None, None),  # unsupported codec
        ("aud1", "audio", bytes(range(50)), "wav", None, None, None),
        ("vid1", "video", bytes(range(128)), "mp4", None, None, 3500),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_schema_and_stub(spark):
    out = image_features(_media_df(spark))
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {"img1", "img2", "img3"}
    assert rows["img1"]["decode_ok"] and rows["img1"]["width"] > 0
    assert rows["img3"]["decode_ok"] is False  # unsupported codec -> flagged, not crashed
    assert rows["img2"]["n_bytes"] == 200


def test_audio_features(spark):
    out = audio_features(_media_df(spark)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["media_id"] == "aud1" and r["decode_ok"] and r["duration_ms"] == 400


def test_frame_sampling_fanout(spark):
    out = sample_frames(_media_df(spark), every_ms=1000).collect()
    # 3500ms at 1 frame/s => frames at 0,1000,2000,3000
    assert [r["frame_index"] for r in out] == [0, 1, 2, 3]
    assert all(isinstance(r["frame"], (bytes, bytearray)) for r in out)


def test_media_stats_jvm_side(spark):
    out = with_media_stats(_media_df(spark))
    assert out.filter(~F.col("has_content")).count() == 0
    got = {r["media_id"]: r["n_bytes"] for r in out.collect()}
    assert got["img2"] == 200
    # no Python UDF in this plan: stats run at scan speed
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
