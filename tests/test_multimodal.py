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


def _real_media_df(spark):
    import numpy as np

    from stock_data_project_spark.operators.codecs import (
        encode_bmp,
        encode_png,
        encode_wav,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (9, 7, 3)).astype(np.uint8)
    wav = rng.integers(-30000, 30000, (300, 2)).astype(np.int16)
    rows = [
        (1, bytearray(encode_png(img)), ("image", 0, 0)),
        (2, bytearray(encode_bmp(img)), ("image", 0, 0)),
        (3, bytearray(encode_wav(wav, rate=8000)), ("audio", 0, 0)),
        (4, bytearray(b"plain text payload"), ("text", 0, 0)),
        (5, bytearray(b"BM corrupt not a real bmp" * 3), ("image", 0, 0)),
    ]
    schema = (
        "doc_id long, payload binary, "
        "meta struct<media_type:string, n_bytes:long, checksum:long>"
    )
    return spark.createDataFrame(rows, schema), img, wav


def test_extract_features_decodes_real_media(spark):
    """Genuine WAV/PNG/BMP payloads are REALLY decoded (r7,
    stdlib codecs): the feature head identifies kind/dims/channels
    and the stats match a direct numpy computation; text and corrupt
    payloads fall back to the byte-fake per row."""
    import numpy as np

    df, img, wav = _real_media_df(spark)
    feats = {r.doc_id: r.features for r in extract_features(df).collect()}
    for d in (1, 2):  # png + bmp: same pixels, same features
        kind, h, w, c = feats[d][:4]
        assert (kind, h, w, c) == (2.0, 9.0, 7.0, 3.0)
        arr = img.astype(np.float64)
        want = [round(float(f(arr)) / 255.0, 6) for f in (np.mean, np.std, np.min, np.max)]
        assert feats[d][4:] == want
    kind, rate, n, ch = feats[3][:4]
    assert (kind, rate, n, ch) == (1.0, 8000.0, 300.0, 2.0)
    # text + corrupt-BM payloads use the byte-fake (first-bytes/255)
    assert feats[4][0] == ord("p") / 255.0
    assert feats[5][0] == ord("B") / 255.0


def test_resize_media_really_resizes_real_images(spark):
    """A real PNG/BMP payload comes back as a REAL re-encoded image
    of the target dimensions whose pixels equal the nearest-neighbor
    resample; a corrupt image-typed payload keeps the deterministic
    tile fake (row degrades, batch survives)."""
    import numpy as np

    from stock_data_project_spark.operators.codecs import (
        decode_bmp,
        decode_png,
        resize_nearest,
    )

    df, img, _ = _real_media_df(spark)
    out = {r.doc_id: r for r in resize_media(df, width=5, height=4).collect()}
    want = resize_nearest(img, 5, 4)
    assert np.array_equal(decode_png(bytes(out[1].payload)), want)
    assert np.array_equal(decode_bmp(bytes(out[2].payload)), want)
    assert (out[1].width, out[1].height) == (5, 4)
    assert len(bytes(out[5].payload)) == 5 * 4  # tile fake for corrupt
    assert bytes(out[4].payload) == b"plain text payload"  # non-image passthrough
    assert out[4].width is None


def test_sample_frames_really_decodes_apng(spark):
    """A genuine APNG video payload yields REAL decoded frames:
    stride-sampled indices, timestamps from the animation's own
    delay, and each output frame is a still PNG with the original
    pixels; a non-APNG payload keeps the 256-byte-chunk fake."""
    import numpy as np

    from stock_data_project_spark.operators.codecs import (
        decode_png,
        encode_apng,
    )

    rng = np.random.default_rng(13)
    frames = [rng.integers(0, 256, (4, 3, 3)).astype(np.uint8) for _ in range(6)]
    rows = [
        (1, bytearray(encode_apng(frames, delay_ms=200)), ("video", 0, 0)),
        (2, bytearray(b"x" * 600), ("video", 0, 0)),  # fake path
        (3, bytearray(b"not video"), ("text", 0, 0)),  # emits nothing
    ]
    schema = (
        "doc_id long, payload binary, "
        "meta struct<media_type:string, n_bytes:long, checksum:long>"
    )
    df = spark.createDataFrame(rows, schema)
    out = sample_frames(df, stride=2, max_frames=8, fps=1.0).collect()
    apng_rows = sorted(
        (r for r in out if r.doc_id == 1), key=lambda r: r.frame_idx
    )
    assert [r.frame_idx for r in apng_rows] == [0, 2, 4]
    assert [round(r.ts_sec, 3) for r in apng_rows] == [0.0, 0.4, 0.8]
    for r in apng_rows:
        assert np.array_equal(decode_png(bytes(r.frame)), frames[r.frame_idx])
    fake_rows = [r for r in out if r.doc_id == 2]
    assert len(fake_rows) == 2  # 600 bytes → 3 chunks, stride 2 → idx 0, 2
    assert not [r for r in out if r.doc_id == 3]


def test_gif_through_all_three_kernels(spark):
    """r8: genuine GIF payloads are really decoded by every kernel —
    features from frame 0, resize preserves the animation (every
    frame resampled, delays kept), sample_frames stride-samples with
    cumulative per-frame timestamps."""
    import numpy as np

    from stock_data_project_spark.operators.codecs import (
        decode_gif,
        decode_png,
        encode_gif,
        resize_nearest,
    )

    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    frames = [pal[rng.integers(0, 16, (6, 8))] for _ in range(4)]
    still = encode_gif(frames[:1])
    anim = encode_gif(frames, delay_ms=[100, 200, 400, 800])
    rows = [
        (1, bytearray(still), ("image", 0, 0)),
        (2, bytearray(anim), ("image", 0, 0)),
        (3, bytearray(anim), ("video", 0, 0)),
    ]
    schema = (
        "doc_id long, payload binary, "
        "meta struct<media_type:string, n_bytes:long, checksum:long>"
    )
    df = spark.createDataFrame(rows, schema)

    feats = {r.doc_id: r.features for r in extract_features(df).collect()}
    assert feats[1][:4] == [2.0, 6.0, 8.0, 3.0]
    arr = frames[0].astype(np.float64)
    assert feats[1][4:] == [
        round(float(f(arr)) / 255.0, 6) for f in (np.mean, np.std, np.min, np.max)
    ]

    out = {r.doc_id: r for r in resize_media(df, width=4, height=3).collect()}
    back, delays = decode_gif(bytes(out[2].payload))
    assert len(back) == 4 and [round(d, 1) for d in delays] == [0.1, 0.2, 0.4, 0.8]
    for src, got in zip(frames, back):
        assert np.array_equal(got, resize_nearest(src, 4, 3))

    sampled = sorted(
        (r for r in sample_frames(df, stride=2, max_frames=8).collect()),
        key=lambda r: r.frame_idx,
    )
    assert [r.doc_id for r in sampled] == [3, 3]
    assert [r.frame_idx for r in sampled] == [0, 2]
    # cumulative starts: frame 0 at 0.0, frame 2 at 0.1+0.2
    assert [round(r.ts_sec, 3) for r in sampled] == [0.0, 0.3]
    for r in sampled:
        assert np.array_equal(decode_png(bytes(r.frame)), frames[r.frame_idx])
