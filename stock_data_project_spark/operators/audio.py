"""Audio feature extraction over WAV payload columns.

Per-window spectral-shape signals — RMS energy, zero-crossing rate,
peak amplitude — the classic cheap audio descriptors (zero-crossing
+ energy framing go back to Rabiner & Schafer's speech-processing
texts; they're what a training-data pipeline computes to gate
silence/clipped/noise clips before an expensive model pass).

Spark shape: one map-only Arrow kernel per payload (decode via
operators/codecs.decode_wav — the REAL stdlib decoder), emitting one
row per (doc, window). All kernel outputs are EXACT integers
(counts, peak, sum of squares); the only float (RMS) is derived in
Spark SQL expressions from the exact sum so no Python float/round
ever touches a graded value (CLAUDE.md banker's-rounding rule).
Memory is bounded by batch_rows × windows; no shuffle anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
    ]
)


def spectral_features(media: DataFrame, window: int = 256) -> DataFrame:
    """(doc_id, window_idx, n_samples, zero_crossings, peak, sum_sq)
    per fixed-width sample window of each decodable WAV payload.

    - ``zero_crossings``: strict sign changes (s[k]·s[k-1] < 0)
      between consecutive samples WITHIN the window — zeros never
      count, so the definition is engine-replayable without a sign
      convention.
    - ``peak``: max |s| over the window.
    - ``sum_sq``: exact Σ s² in int64 (|s| ≤ 32768 → a window's sum
      ≤ window · 2³⁰, no overflow risk at any window size a pipeline
      would use). RMS = sqrt(sum_sq / window) is left to the caller
      as a Spark expression over this exact integer.

    Multi-channel audio is flattened channel-major per frame (the
    decoder's (frames, channels) layout, row-major), matching a
    byte-order replay. Undecodable payloads emit no rows."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from stock_data_project_spark.operators.codecs import decode_wav

        for pdf in batches:
            rows = {k.name: [] for k in _SPECTRAL_SCHEMA.fields}
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                raw = b"" if p is None else bytes(p)
                try:
                    _rate, samples = decode_wav(raw)
                except ValueError:
                    continue
                s = samples.astype(np.int64).reshape(-1)
                for w_start in range(0, s.shape[0], window):
                    seg = s[w_start : w_start + window]
                    # strict sign change, never across the window edge
                    zc = int(np.sum(seg[1:] * seg[:-1] < 0))
                    rows["doc_id"].append(did)
                    rows["window_idx"].append(w_start // window)
                    rows["n_samples"].append(int(seg.shape[0]))
                    rows["zero_crossings"].append(zc)
                    rows["peak"].append(int(np.abs(seg).max()) if seg.size else 0)
                    rows["sum_sq"].append(int(np.sum(seg * seg)))
            if rows["doc_id"]:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.array(rows["doc_id"], dtype="Int64"),
                        "window_idx": pd.array(rows["window_idx"], dtype="Int32"),
                        "n_samples": pd.array(rows["n_samples"], dtype="Int64"),
                        "zero_crossings": pd.array(
                            rows["zero_crossings"], dtype="Int64"
                        ),
                        "peak": pd.array(rows["peak"], dtype="Int64"),
                        "sum_sq": pd.array(rows["sum_sq"], dtype="Int64"),
                    }
                )

    return media.mapInPandas(kernel, schema=_SPECTRAL_SCHEMA)


# ------------------------------------------------ synthetic audio corpus

PCM_MULT_DOC = 7919
PCM_MULT_K = 104729
PCM_MOD = 65536
PCM_SHIFT = 32768


def synth_pcm(doc_id: int, n_samples: int) -> np.ndarray:
    """Deterministic int16 PCM, sample k =
    ((doc_id·7919 + k·104729) mod 65536) − 32768 — pure integer
    arithmetic an SQL oracle replays verbatim (all terms
    non-negative, so Python %, Spark %, and DuckDB % agree)."""
    k = np.arange(n_samples, dtype=np.int64)
    return (
        (doc_id * PCM_MULT_DOC + k * PCM_MULT_K) % PCM_MOD - PCM_SHIFT
    ).astype(np.int16)


def with_synthetic_wav_payload(docs: DataFrame, n_samples: int = 2048) -> DataFrame:
    """(doc_id, payload): REAL mono 16-bit WAV containers around the
    deterministic PCM — the decode path then exercises the genuine
    encode_wav → decode_wav round trip, not a byte fake."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from stock_data_project_spark.operators.codecs import encode_wav

        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_wav(synth_pcm(int(did), n_samples))
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


# -------------------------------------------- spectral audio fingerprint

AFP_BITS = 64
AFP_WINDOW = 2048
_AFP_GROUP_SEED = 4_000_003
_AFP_MEMBER_SEED = 5_000_003


def audio_fingerprint64(samples: np.ndarray) -> int:
    """64-bit spectral fingerprint of a PCM clip (Haitsma & Kalker
    2002's energy-threshold family, single-frame form): magnitudes of
    rfft bins 1..64 over the first 2048 samples, bit b set iff
    |X_{b+1}| strictly exceeds the bin-magnitude median. Median
    thresholding makes the fingerprint invariant under uniform gain
    (the pHash affine argument, one-sided), so volume normalization
    between near-duplicate encodes never flips bits."""
    s = np.asarray(samples, dtype=np.float64).reshape(-1)[:AFP_WINDOW]
    if s.shape[0] < AFP_WINDOW:
        s = np.pad(s, (0, AFP_WINDOW - s.shape[0]))
    mags = np.abs(np.fft.rfft(s))[1 : AFP_BITS + 1]
    med = float(np.median(mags))
    h = 0
    for i, m in enumerate(mags):
        if m > med:
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """(doc_id, afp) from a (doc_id, payload) frame: decode_wav (the
    REAL stdlib decoder) → spectral fingerprint. Undecodable rows are
    dropped. Map-only Arrow kernel, no shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from stock_data_project_spark.operators.codecs import decode_wav

        for pdf in batches:
            ids, hashes = [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                raw = b"" if p is None else bytes(p)
                try:
                    _rate, samples = decode_wav(raw)
                except ValueError:
                    continue
                ids.append(did)
                hashes.append(audio_fingerprint64(samples))
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.array(ids, dtype="Int64"),
                        "afp": pd.array(hashes, dtype="Int64"),
                    }
                )

    return media.mapInPandas(
        kernel,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("afp", T.LongType()),
            ]
        ),
    )


def synth_group_pcm(doc_id: int, group_size: int = 100) -> np.ndarray:
    """Deterministic int16 clip with PLANTED near-dup structure: all
    docs in the same ``doc_id div group_size`` group share a spectral
    skeleton — 32 'loud' (amp 2000-3000) and 32 'quiet' (amp 100-600)
    of the fingerprint's 64 bins, exact integer-bin cosines — while
    each member adds its own content STRICTLY above bin 64
    (orthogonal over the full 2048-sample window, so it cannot leak
    into fingerprint bins) plus per-clip peak normalization and int16
    rounding.

    Margin argument (the _spec_pixels twin): the loud/quiet gap is
    ≥ 1400 raw (≥ ~500 after worst-case normalization) while int16
    rounding perturbs a bin magnitude by σ ≈ 16 — a ~30σ margin, so
    member bits can never flip; gain normalization is invisible to
    the median threshold. Across groups the loud-bin subsets are
    independent → expected hamming ≈ 32."""
    rs_g = np.random.RandomState(_AFP_GROUP_SEED + doc_id // group_size)
    loud = np.zeros(AFP_BITS, dtype=bool)
    loud[rs_g.permutation(AFP_BITS)[: AFP_BITS // 2]] = True
    amps = np.where(
        loud,
        rs_g.uniform(2000.0, 3000.0, AFP_BITS),
        rs_g.uniform(100.0, 600.0, AFP_BITS),
    )
    phases = rs_g.uniform(0.0, 2.0 * np.pi, AFP_BITS)

    rs_m = np.random.RandomState(_AFP_MEMBER_SEED + doc_id)
    mbins = rs_m.randint(AFP_BITS + 1, AFP_WINDOW // 2, 32)
    mamps = rs_m.uniform(200.0, 800.0, 32)
    mphases = rs_m.uniform(0.0, 2.0 * np.pi, 32)

    t = np.arange(AFP_WINDOW, dtype=np.float64)
    sig = np.zeros(AFP_WINDOW)
    for b in range(AFP_BITS):
        sig += amps[b] * np.cos(2.0 * np.pi * (b + 1) * t / AFP_WINDOW + phases[b])
    for b, a, ph in zip(mbins, mamps, mphases):
        sig += a * np.cos(2.0 * np.pi * b * t / AFP_WINDOW + ph)
    a = 30000.0 / max(float(np.abs(sig).max()), 1e-9)
    return np.rint(a * sig).astype(np.int16)


def with_synthetic_group_wav_payload(
    docs: DataFrame, group_size: int = 100
) -> DataFrame:
    """(doc_id, payload): REAL WAV containers around the planted
    near-dup-group PCM (synth_group_pcm) — the audio twin of
    operators/phash.with_synthetic_image_payload."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from stock_data_project_spark.operators.codecs import encode_wav

        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        encode_wav(synth_group_pcm(int(did), group_size))
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
