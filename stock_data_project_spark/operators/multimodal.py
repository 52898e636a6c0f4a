"""Multimodal column plumbing: opaque binary payloads + typed
metadata + a batched feature-extraction stage.

The container has no image/audio codecs, so the DECODE step is a
deterministic fake (clearly marked) — but everything Spark-side is
real and scale-shaped: binary column handling, metadata struct
derivation with built-in functions, and an Arrow-batched
``mapInPandas`` feature extractor with an explicit output schema
(the exact seam where a real decoder — PIL / torchaudio / ffmpeg —
would slot in, one batch at a time, bounded memory).
"""

from __future__ import annotations

from collections.abc import Iterator

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


def _extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB DECODER: a real implementation would decode the payload
    (PIL.Image.open / soundfile.read / ffmpeg frame sample) here.
    This fake derives FEATURE_DIM deterministic doubles from the
    first bytes of the payload so the pipeline shape (Arrow batch in,
    fixed-width feature batch out) is fully exercised."""
    for pdf in batches:
        feats = [
            [
                float(b) / 255.0
                for b in (
                    (b"" if p is None else bytes(p))[:FEATURE_DIM].ljust(
                        FEATURE_DIM, b"\0"
                    )
                )
            ]
            for p in pdf["payload"]
        ]
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
    with NULL dimensions. STUB KERNEL: a real implementation decodes
    the payload (PIL.Image.open(...).resize((w, h))) — the fake
    tiles/truncates the raw bytes to exactly width×height so the
    Spark-side contract (binary in, fixed-size binary out, one row
    per input, Arrow-batched bounded memory) is fully exercised.
    """
    n_out = width * height

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_w, out_h = [], [], []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                raw = b"" if p is None else bytes(p)
                if m["media_type"] == "image":
                    reps = -(-n_out // max(len(raw), 1))  # ceil-div tile count
                    out_payload.append((raw * reps)[:n_out] if raw else b"\0" * n_out)
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
    rows emit nothing). STUB KERNEL: a real implementation seeks
    keyframes (ffmpeg/pyav) — the fake treats each 256-byte payload
    chunk as one decoded frame, takes every ``stride``-th chunk up to
    ``max_frames``, and stamps ``ts_sec`` from the frame index and
    ``fps``. Memory stays bounded by (batch rows × max_frames)
    regardless of video length.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "ts_sec": [], "frame": []}
            for did, p, m in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                if m["media_type"] != "video" or p is None:
                    continue
                raw = bytes(p)
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
