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
