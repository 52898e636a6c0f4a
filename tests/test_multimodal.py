"""Multimodal plumbing: the Spark-side contracts around the stubbed
decode kernels — schemas, row multiplicities, passthrough rules, and
determinism. The kernels are deterministic fakes (no codecs in the
container); these tests pin the seams a real decoder slots into."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from stock_data_project_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    resize_media,
    sample_frames,
    with_media_payload,
)
from tests.conftest import SF_SMOKE


def _media(spark):
    return with_media_payload(load_table(spark, SF_SMOKE, "documents"))


def test_payload_and_meta_shape(spark):
    media = _media(spark)
    row = media.filter(F.col("meta.media_type") == "image").first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["n_bytes"] == len(row["payload"])
    kinds = {r["media_type"] for r in media.select("meta.media_type").distinct().collect()}
    assert {"image", "audio", "video", "text"} <= kinds


def test_extract_features_fixed_width(spark):
    feats = extract_features(_media(spark))
    assert feats.filter(F.size("features") != FEATURE_DIM).count() == 0
    assert feats.count() == _media(spark).count()  # one row per input
    # deterministic: same input -> same features
    a = feats.orderBy("doc_id").first()["features"]
    b = extract_features(_media(spark)).orderBy("doc_id").first()["features"]
    assert a == b


def test_resize_images_only(spark):
    media = _media(spark)
    out = resize_media(media, width=16, height=16).cache()
    try:
        assert out.count() == media.count()  # one row per input, any type
        imgs = out.filter(F.col("media_type") == "image")
        assert imgs.filter(F.length("payload") != 16 * 16).count() == 0
        assert imgs.filter(F.col("width").isNull()).count() == 0
        others = out.filter(F.col("media_type") != "image")
        assert others.filter(F.col("width").isNotNull()).count() == 0
        # non-image payloads pass through byte-identical
        src = media.filter(F.col("meta.media_type") == "audio").select(
            "doc_id", F.col("payload").alias("orig")
        )
        joined = others.join(src, "doc_id")
        assert joined.filter(F.col("payload") != F.col("orig")).count() == 0
    finally:
        out.unpersist()


def test_sample_frames_video_only_and_bounded(spark):
    media = _media(spark)
    frames = sample_frames(media, stride=2, max_frames=4).cache()
    try:
        n_videos = media.filter(F.col("meta.media_type") == "video").count()
        assert n_videos > 0
        # only video docs emit frames; each emits 1..max_frames rows
        per_doc = frames.groupBy("doc_id").count().collect()
        assert len(per_doc) == n_videos
        assert all(1 <= r["count"] <= 4 for r in per_doc)
        # stride shows in the frame indices; timestamps follow fps
        bad = frames.filter(
            (F.col("frame_idx") % 2 != 0)
            | (F.col("ts_sec") != F.col("frame_idx").cast("double"))
        )
        assert bad.count() == 0
    finally:
        frames.unpersist()
