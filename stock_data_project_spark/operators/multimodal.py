"""Multimodal column plumbing: opaque binary payloads + typed
metadata + a batched feature-extraction stage.

Since r7 the decode step is REAL for the formats the standard
library can handle — WAV (``wave``), BMP (``struct``), PNG/APNG
(``zlib``) and, since r8, GIF (stdlib LZW) and baseline JPEG
(numpy Huffman+IDCT) — via operators/codecs.py: kernels sniff the
payload's
magic bytes and genuinely decode/resample matching rows; payloads
that aren't parseable media (this corpus's text-byte fakes, or
corrupt blobs) degrade PER-ROW to the original deterministic
byte-fake, so the pipeline never loses a row to a bad blob. JPEG
and inter-frame video stay out of scope (entropy/motion decoders
aren't a reasonable stdlib reimplementation) — ``sample_frames``
remains the honest stub seam where ffmpeg/pyav would slot in.

Everything Spark-side is scale-shaped either way: binary column
handling, metadata struct derivation with built-in functions, and
Arrow-batched ``mapInPandas`` kernels with explicit output schemas —
one batch at a time, bounded memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

_MEDIA_BY_SOURCE = {"src0": "image", "src1": "audio", "src2": "video"}


def with_media_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model documents as media blobs: payload = utf8 bytes of the
    text (deterministic fake for a real image/audio blob), media_type
    derived from the source tag, plus byte-length metadata."""
    media_type = F.coalesce(
        *[
            F.when(F.col("source") == src, F.lit(mt))
            for src, mt in _MEDIA_BY_SOURCE.items()
        ],
        F.lit("text"),
    )
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            media_type.alias("media_type"),
            F.length(payload).alias("n_bytes"),
            F.crc32(payload).alias("checksum"),
        ).alias("meta"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _byte_fake_features(raw: bytes) -> list[float]:
    """The deterministic non-media fallback: FEATURE_DIM doubles from
    the first payload bytes (the pre-r7 behavior, unchanged so text
    payloads keep their feature values)."""
    return [
        float(b) / 255.0 for b in raw[:FEATURE_DIM].ljust(FEATURE_DIM, b"\0")
    ]


def _real_features(raw: bytes) -> list[float] | None:
    """REAL decode for stdlib-supported formats (codecs.py). Returns
    None when the payload isn't parseable media — caller falls back
    to the byte-fake for that ROW. Layout (8 doubles):
    [kind (1=audio, 2=image), dim1, dim2, channels,
     mean, std, min, max]  — stats normalized to [−1, 1]-ish by the
    format's full scale, rounded 6dp (row-local, deterministic)."""
    from stock_data_project_spark.operators.codecs import (
        decode_bmp,
        decode_gif,
        decode_jpeg,
        decode_png,
        decode_wav,
        sniff_media,
    )

    kind = sniff_media(raw)
    if kind is None:
        return None
    try:
        if kind == "wav":
            rate, samples = decode_wav(raw)
            arr, scale = samples.astype(np.float64), 32768.0
            head = [1.0, float(rate), float(samples.shape[0]), float(samples.shape[1])]
        else:
            if kind == "gif":  # stats over the first (or only) frame
                px = decode_gif(raw)[0][0]
            elif kind == "jpeg":
                px = decode_jpeg(raw)
            else:
                px = decode_png(raw) if kind == "png" else decode_bmp(raw)
            arr, scale = px.astype(np.float64), 255.0
            c = px.shape[2] if px.ndim == 3 else 1
            head = [2.0, float(px.shape[0]), float(px.shape[1]), float(c)]
    except ValueError:
        return None
    if arr.size == 0:
        return None
    stats = [
        round(float(f(arr)) / scale, 6)
        for f in (np.mean, np.std, np.min, np.max)
    ]
    return head + stats


def _extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-row: REAL decode when the payload is genuine WAV/BMP/PNG
    (magic-sniffed), byte-fake fallback otherwise — Arrow batch in,
    fixed-width feature batch out, bounded memory either way."""
    for pdf in batches:
        feats = []
        for p in pdf["payload"]:
            raw = b"" if p is None else bytes(p)
            feats.append(_real_features(raw) or _byte_fake_features(raw))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": [m["media_type"] for m in pdf["meta"]],
                "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                "features": feats,
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column."""
    return media.mapInPandas(_extract_batch, schema=_FEATURE_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_media(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize stage for image-typed rows; other media pass through
    with NULL dimensions. REAL for genuine PNG/BMP (r7), GIF (r8,
    every frame + delays preserved) and baseline JPEG (r8, re-encoded
    at quality 90) payloads: decode (codecs.py) → nearest-neighbor
    resample → re-encode in the SAME container format. Rows typed "image" whose bytes are not
    parseable media keep the pre-r7 deterministic tile/truncate fake
    (degrade the ROW, never the batch) — the Spark-side contract
    (binary in, fixed-size-or-real-image binary out, one row per
    input, Arrow-batched bounded memory) holds on every path.
    """
    n_out = width * height

    def _real_resize(raw: bytes) -> bytes | None:
        from stock_data_project_spark.operators.codecs import (
            decode_bmp,
            decode_gif,
            decode_jpeg,
            decode_png,
            encode_bmp,
            encode_gif,
            encode_jpeg,
            encode_png,
            resize_nearest,
            sniff_media,
        )

        kind = sniff_media(raw)
        if kind not in ("png", "bmp", "gif", "jpeg"):
            return None
        try:
            if kind == "png":
                px = resize_nearest(decode_png(raw), width, height)
                return encode_png(px)
            if kind == "jpeg":
                px = resize_nearest(decode_jpeg(raw), width, height)
                return encode_jpeg(px, quality=90)
            if kind == "gif":
                # resize EVERY frame, keep the animation + its delays;
                # nearest-neighbor only samples existing pixels, so
                # the ≤256-color palette invariant survives
                frames, delays = decode_gif(raw)
                return encode_gif(
                    [resize_nearest(f, width, height) for f in frames],
                    delay_ms=[int(round(d * 1000)) for d in delays],
                )
            px = resize_nearest(decode_bmp(raw), width, height)
            return encode_bmp(px)
        except ValueError:
            return None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_w, out_h = [], [], []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                raw = b"" if p is None else bytes(p)
                if m["media_type"] == "image":
                    real = _real_resize(raw)
                    if real is not None:
                        out_payload.append(real)
                    else:
                        reps = -(-n_out // max(len(raw), 1))  # ceil-div tiles
                        out_payload.append(
                            (raw * reps)[:n_out] if raw else b"\0" * n_out
                        )
                    out_w.append(width)
                    out_h.append(height)
                else:
                    out_payload.append(raw)
                    out_w.append(None)
                    out_h.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "payload": out_payload,
                    "width": pd.array(out_w, dtype="Int32"),
                    "height": pd.array(out_h, dtype="Int32"),
                }
            )

    return media.mapInPandas(kernel, schema=_RESIZE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_sec", T.DoubleType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

_FRAME_BYTES = 256  # stub "frame" size; a real decoder yields pixels


def sample_frames(
    media: DataFrame,
    stride: int = 2,
    max_frames: int = 8,
    fps: float = 1.0,
) -> DataFrame:
    """Frame sampling for video-typed rows: one OUTPUT ROW PER
    SAMPLED FRAME — the one-to-many batch shape a real video pipeline
    needs (mapInPandas emits more rows than it receives; non-video
    rows emit nothing). REAL for APNG (r7) and animated-GIF (r8)
    payloads (codecs.py): frames genuinely decoded, stride-sampled,
    timestamped from the animation's own per-frame delays
    (cumulative), and re-encoded as single still PNGs. Inter-frame
    compressed video (H.26x/VP9 in MP4/WebM) remains the honest stub
    seam where ffmpeg/pyav would slot in — such payloads (and the
    corpus's text-byte fakes) fall back per-row to the deterministic
    256-byte-chunk fake. Memory stays bounded by (batch rows ×
    max_frames) on every path.
    """

    def _real_frames(raw: bytes) -> list[tuple[int, float, bytes]] | None:
        from stock_data_project_spark.operators.codecs import (
            decode_apng,
            decode_gif,
            encode_png,
            is_apng,
            sniff_media,
        )

        if is_apng(raw):
            decode = decode_apng
        elif sniff_media(raw) == "gif":
            decode = decode_gif
        else:
            return None
        try:
            frames, delays = decode(raw)
        except ValueError:
            return None
        # frame i is displayed starting at the sum of the PRIOR frames'
        # fcTL durations — per-frame delays, not a uniform cadence
        starts = [0.0]
        for d in delays[:-1]:
            starts.append(starts[-1] + d)
        out = []
        for out_i, src_i in enumerate(range(0, len(frames), stride)):
            if out_i >= max_frames:
                break
            out.append((src_i, starts[src_i], encode_png(frames[src_i])))
        return out

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "ts_sec": [], "frame": []}
            for did, p, m in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                if m["media_type"] != "video" or p is None:
                    continue
                raw = bytes(p)
                real = _real_frames(raw)
                if real is not None:
                    for src_i, ts, frame in real:
                        rows["doc_id"].append(did)
                        rows["frame_idx"].append(src_i)
                        rows["ts_sec"].append(ts)
                        rows["frame"].append(frame)
                    continue
                chunks = [
                    raw[i : i + _FRAME_BYTES]
                    for i in range(0, max(len(raw), 1), _FRAME_BYTES)
                ]
                for out_i, src_i in enumerate(range(0, len(chunks), stride)):
                    if out_i >= max_frames:
                        break
                    rows["doc_id"].append(did)
                    rows["frame_idx"].append(src_i)
                    rows["ts_sec"].append(src_i / fps)
                    rows["frame"].append(chunks[src_i])
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(rows["doc_id"], dtype="Int64"),
                    "frame_idx": pd.array(rows["frame_idx"], dtype="Int32"),
                    "ts_sec": pd.array(rows["ts_sec"], dtype="float64"),
                    "frame": rows["frame"],
                }
            )

    return media.mapInPandas(kernel, schema=_FRAME_SCHEMA)
