"""r9-built media keys staged for the r10 window (llm_next7: image
pHash near-dup, audio spectral features, audio fingerprint near-dup,
video scene cuts): the SAME value-level DuckDB comparison the driver
runs, plus the operators' semantic pins — pHash affine-invariance /
perturbation-robustness / separation, the banded-LSH recall guard,
the audio kernels vs direct numpy, fingerprint gain-invariance, and
the GIF round-trip."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from stock_data_project_spark.operators.audio import (
    spectral_features,
    synth_pcm,
    with_synthetic_wav_payload,
)
from stock_data_project_spark.operators.phash import (
    _synth_pixels,
    phash64,
    phash_candidates,
    phash_hashes,
    with_synthetic_image_payload,
)
from stock_data_project_spark.plans import llm_next7
from tests.conftest import SF_ORACLE
from tests.oracle_utils import assert_gradable_schema, compare, duckdb_run


def test_every_new_key_is_oracled():
    assert set(llm_next7.QUERIES_NEXT) == set(llm_next7.ORACLE_NEXT)


@pytest.mark.parametrize("key", sorted(llm_next7.QUERIES_NEXT))
def test_new_key_parity(spark, key):
    df = llm_next7.QUERIES_NEXT[key](spark, SF_ORACLE)
    assert_gradable_schema(df, key)
    assert df.count() > 0, f"{key}: empty result"
    compare(df, duckdb_run(llm_next7.ORACLE_NEXT[key], SF_ORACLE))


# ------------------------------------------------------------------ pHash


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_affine_invariance():
    """Median thresholding makes the hash exactly invariant under
    a·px + b (a > 0) — the property that lets the synthetic corpus
    normalize per-image without touching bits."""
    rs = np.random.RandomState(7)
    px = rs.randint(0, 256, (32, 32)).astype(np.float64)
    assert phash64(px) == phash64(0.5 * px + 40.0)
    assert phash64(px) == phash64(2.0 * px - 10.0)


def test_phash_pixel_perturbation_robustness():
    """The r8-verdict robustness pin: small pixel-level edits (high-
    frequency noise, single-pixel pokes) move the hash ≤ a few bits;
    independent random images sit near 32/64 apart."""
    rs = np.random.RandomState(11)
    base = rs.randint(32, 224, (32, 32)).astype(np.float64)
    h0 = phash64(base)
    # iid ±1 noise on every pixel: projections onto any low-freq DCT
    # coefficient are ~N(0, 0.8) vs typical median margins of ~3
    noisy = base + rs.randint(-1, 2, (32, 32))
    assert _hamming(h0, phash64(noisy)) <= 6
    # a single saturated pixel spreads 1/1024 of its energy per coef
    poked = base.copy()
    poked[5, 7] = 255.0
    assert _hamming(h0, phash64(poked)) <= 6
    # unrelated images: ~Binomial(63, 0.5)
    dists = [
        _hamming(h0, phash64(np.random.RandomState(100 + i).randint(0, 256, (32, 32))))
        for i in range(20)
    ]
    assert min(dists) > 12 and max(dists) < 52


def test_phash_synth_groups_have_exact_margins():
    """Planted members hash ≤ 2 bits from their group skeleton while
    cross-group distances stay far above the banding threshold —
    the construction the oracle's recall=precision=1 claim rests on."""
    hashes = {}
    for doc_id in [0, 20, 40, 60, 80, 100, 120, 140, 300, 520]:
        hashes[doc_id] = phash64(_synth_pixels(doc_id, 100))
    for a in hashes:
        for b in hashes:
            if a >= b:
                continue
            d = _hamming(hashes[a], hashes[b])
            if a // 100 == b // 100:
                assert d <= 2, (a, b, d)
            else:
                assert d >= 15, (a, b, d)


def test_phash_candidates_pigeonhole_guard(spark):
    h = spark.createDataFrame([(1, 5), (2, 6)], "doc_id long, phash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_candidates(h, max_hamming=4, bands=4).collect()


def test_phash_hashes_drops_undecodable_rows(spark):
    from stock_data_project_spark.operators.codecs import encode_bmp

    px = np.full((8, 8, 3), 77, dtype=np.uint8)
    rows = [
        (1, bytearray(encode_bmp(px))),
        (2, bytearray(b"not an image at all")),
        (3, None),
    ]
    out = phash_hashes(
        spark.createDataFrame(rows, "doc_id long, payload binary")
    ).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_phash_pipeline_handles_empty_partitions(spark):
    """Sparse createDataFrame inputs produce empty partitions — the
    kernels must yield nothing for them (the Arrow empty-column
    rule), and the LSH must still find the planted pair."""
    ids = spark.createDataFrame(
        [(0,), (20,)], "doc_id long"
    ).repartition(8)
    pairs = phash_candidates(
        phash_hashes(with_synthetic_image_payload(ids, group_size=100))
    ).collect()
    assert [(r["doc_id_a"], r["doc_id_b"]) for r in pairs] == [(0, 20)]
    assert pairs[0]["hamming"] <= 2


# ------------------------------------------------------------------ audio


def test_synth_pcm_matches_oracle_arithmetic():
    s = synth_pcm(21, 2048)
    k = np.arange(2048, dtype=np.int64)
    want = (21 * 7919 + k * 104729) % 65536 - 32768
    assert (s.astype(np.int64) == want).all()
    assert s.dtype == np.int16


def test_spectral_features_match_numpy(spark):
    ids = spark.createDataFrame([(1,), (21,)], "doc_id long")
    out = (
        spectral_features(with_synthetic_wav_payload(ids, n_samples=512), window=256)
        .orderBy("doc_id", "window_idx")
        .collect()
    )
    assert len(out) == 4
    for r in out:
        s = synth_pcm(r["doc_id"], 512).astype(np.int64)
        seg = s[r["window_idx"] * 256 : (r["window_idx"] + 1) * 256]
        assert r["n_samples"] == 256
        assert r["zero_crossings"] == int(np.sum(seg[1:] * seg[:-1] < 0))
        assert r["peak"] == int(np.abs(seg).max())
        assert r["sum_sq"] == int(np.sum(seg * seg))


def test_spectral_features_multichannel_and_ragged_tail(spark):
    """Stereo flattens channel-major per frame; a trailing partial
    window reports its true n_samples; undecodable rows vanish."""
    from stock_data_project_spark.operators.codecs import encode_wav

    stereo = np.stack([np.arange(10, dtype=np.int16), -np.arange(10, dtype=np.int16)], axis=1)
    rows = [(1, bytearray(encode_wav(stereo))), (2, bytearray(b"junk"))]
    out = (
        spectral_features(
            spark.createDataFrame(rows, "doc_id long, payload binary"), window=16
        )
        .orderBy("doc_id", "window_idx")
        .collect()
    )
    assert [r["doc_id"] for r in out] == [1, 1]
    assert [r["n_samples"] for r in out] == [16, 4]
    flat = stereo.astype(np.int64).reshape(-1)
    assert out[0]["sum_sq"] == int(np.sum(flat[:16] ** 2))
    assert out[1]["sum_sq"] == int(np.sum(flat[16:] ** 2))
    # interleaved +k/−k alternation: every consecutive nonzero pair
    # flips sign
    assert out[0]["zero_crossings"] == int(np.sum(flat[1:16] * flat[:15] < 0))


def test_audio_rms_never_ties_at_6dp(spark):
    """sqrt(int/256) can only equal an exact 6dp rounding tie if an
    odd k/128 squares to an integer/256 — impossible; spot-check the
    graded rms values against exact decimal recomputation."""
    from decimal import Decimal

    pdf = (
        llm_next7.q_audio_spectral(spark, SF_ORACLE)
        .limit(50)
        .toPandas()
    )
    for _, r in pdf.iterrows():
        exact = (Decimal(int(r["sum_sq"])) / Decimal(256)).sqrt()
        tie = (exact * Decimal(10**6)) % 1 == Decimal("0.5")
        assert not tie


# ------------------------------------------------------------------ video


def test_video_frames_within_shot_near_across_cut_far():
    from stock_data_project_spark.operators.phash import synth_video_frames

    for doc_id in (2, 42, 122, 1002):
        frames = synth_video_frames(doc_id)
        cut = 2 + (doc_id // 20) % 5
        hs = [phash64(f) for f in frames]
        for i in range(1, len(hs)):
            d = _hamming(hs[i - 1], hs[i])
            if i == cut:
                assert d >= 15, (doc_id, i, d)
            else:
                assert d <= 2, (doc_id, i, d)


def test_video_scene_cuts_roundtrip_and_undecodable(spark):
    from stock_data_project_spark.operators.phash import (
        video_scene_cuts,
        with_synthetic_video_payload,
    )

    ids = spark.createDataFrame([(2,), (42,), (122,)], "doc_id long")
    got = sorted(
        (r["doc_id"], r["cut_frame"])
        for r in video_scene_cuts(with_synthetic_video_payload(ids)).collect()
    )
    assert got == [(2, 2 + 0), (42, 2 + 2), (122, 2 + (122 // 20) % 5)]
    junk = spark.createDataFrame(
        [(9, bytearray(b"not a gif"))], "doc_id long, payload binary"
    )
    assert video_scene_cuts(junk).count() == 0


# -------------------------------------------------- audio fingerprint


def test_audio_fingerprint_gain_invariance_and_margins():
    from stock_data_project_spark.operators.audio import (
        audio_fingerprint64,
        synth_group_pcm,
    )

    s = synth_group_pcm(21)
    h = audio_fingerprint64(s)
    # gain invariance (the median-threshold property)
    assert audio_fingerprint64(s.astype(np.float64) * 0.25) == h
    # planted margins: same group (1, 21, 41) identical; cross far
    for other, same in ((1, True), (41, True), (121, False), (1021, False)):
        d = _hamming(h, audio_fingerprint64(synth_group_pcm(other)))
        assert (d == 0) if same else (d >= 15), (other, d)


def test_audio_fingerprints_wav_roundtrip_and_undecodable(spark):
    from stock_data_project_spark.operators.audio import (
        audio_fingerprint64,
        audio_fingerprints,
        synth_group_pcm,
        with_synthetic_group_wav_payload,
    )

    ids = spark.createDataFrame([(1,), (21,), (121,)], "doc_id long")
    got = {
        r["doc_id"]: r["afp"]
        for r in audio_fingerprints(
            with_synthetic_group_wav_payload(ids)
        ).collect()
    }
    # WAV round trip must not move a single bit
    for did in (1, 21, 121):
        assert got[did] == audio_fingerprint64(synth_group_pcm(did))
    junk = spark.createDataFrame(
        [(9, bytearray(b"not audio"))], "doc_id long, payload binary"
    )
    assert audio_fingerprints(junk).count() == 0
