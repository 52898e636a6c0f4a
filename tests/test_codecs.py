"""Stdlib media codecs: real encode/decode round-trips and the
malformed-input contract (ValueError, never a crash)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from stock_data_project_spark.operators.codecs import (
    PNG_MAGIC,
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    resize_nearest,
    sniff_media,
)


def _rng(seed: int = 7) -> np.random.Generator:
    return np.random.default_rng(seed)


def test_wav_roundtrip_mono_and_stereo():
    rng = _rng()
    mono = (rng.integers(-30000, 30000, 400)).astype(np.int16)
    rate, back = decode_wav(encode_wav(mono, rate=8000))
    assert rate == 8000 and back.shape == (400, 1)
    assert np.array_equal(back[:, 0], mono.astype(np.int32))
    stereo = (rng.integers(-30000, 30000, (250, 2))).astype(np.int16)
    rate, back = decode_wav(encode_wav(stereo, rate=44100))
    assert rate == 44100 and back.shape == (250, 2)
    assert np.array_equal(back, stereo.astype(np.int32))


def test_bmp_roundtrip_including_padded_rows():
    rng = _rng(1)
    # w=3 → row bytes 9 → 3 pad bytes: exercises the 4-byte padding
    img = rng.integers(0, 256, (5, 3, 3)).astype(np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    img2 = rng.integers(0, 256, (4, 4, 3)).astype(np.uint8)  # no pad
    assert np.array_equal(decode_bmp(encode_bmp(img2)), img2)


def test_bmp_top_down_variant():
    img = _rng(2).integers(0, 256, (3, 2, 3)).astype(np.uint8)
    b = bytearray(encode_bmp(img))
    # flip to top-down: negative height + rows already bottom-up in
    # the payload, so reverse them to keep the same logical image
    h = struct.unpack_from("<i", b, 22)[0]
    struct.pack_into("<i", b, 22, -h)
    stride = 2 * 3 + ((-(2 * 3)) % 4)
    off = struct.unpack_from("<I", b, 10)[0]
    rows = [bytes(b[off + r * stride : off + (r + 1) * stride]) for r in range(h)]
    b[off:] = b"".join(reversed(rows))
    assert np.array_equal(decode_bmp(bytes(b)), img)


@pytest.mark.parametrize("shape", [(6, 5), (4, 3, 3), (3, 4, 4), (2, 2, 2)])
def test_png_roundtrip_all_color_types(shape):
    img = _rng(3).integers(0, 256, shape).astype(np.uint8)
    back = decode_png(encode_png(img))
    want = img[:, :, None] if img.ndim == 2 else img
    assert np.array_equal(back, want)


def test_png_decoder_handles_all_five_filters():
    """The encoder only emits filter 0 — craft a 4-row RGB image
    whose scanlines use filters 1-4 and check the decoder against a
    reference unfiltering."""
    w, c = 4, 3
    stride = w * c
    rng = _rng(4)
    img = rng.integers(0, 256, (4, w, c)).astype(np.uint8)

    def sub(line, prev):
        out = np.zeros(stride, np.int32)
        for i in range(stride):
            # predictor uses the RECONSTRUCTED (= original) left
            # pixel, not the encoded byte
            a = int(line[i - c]) if i >= c else 0
            out[i] = (int(line[i]) - a) & 0xFF
        return out

    def up(line, prev):
        return (line.astype(np.int32) - prev.astype(np.int32)) & 0xFF

    def avg(line, prev):
        out = np.zeros(stride, np.int32)
        for i in range(stride):
            a = (int(img[2, (i - c) // c, (i - c) % c]) if i >= c else 0)
            out[i] = (int(line[i]) - ((a + int(prev[i])) >> 1)) & 0xFF
        return out

    def paeth(line, prev):
        out = np.zeros(stride, np.int32)
        flat_cur = img[3].reshape(-1)
        for i in range(stride):
            a = int(flat_cur[i - c]) if i >= c else 0
            b = int(prev[i])
            cc = int(prev[i - c]) if i >= c else 0
            p = a + b - cc
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            out[i] = (int(line[i]) - pred) & 0xFF
        return out

    flat = [img[r].reshape(-1) for r in range(4)]
    raw = b"\x01" + bytes(sub(flat[0], None).astype(np.uint8))
    raw += b"\x02" + bytes(up(flat[1], flat[0]).astype(np.uint8))
    raw += b"\x03" + bytes(avg(flat[2], flat[1]).astype(np.uint8))
    raw += b"\x04" + bytes(paeth(flat[3], flat[2]).astype(np.uint8))

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, 4, 8, 2, 0, 0, 0)
    payload = (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), img)


def test_sniff_and_malformed_inputs():
    img = _rng(5).integers(0, 256, (2, 2, 3)).astype(np.uint8)
    assert sniff_media(encode_png(img)) == "png"
    assert sniff_media(encode_bmp(img)) == "bmp"
    assert sniff_media(encode_wav(np.zeros(4, np.int16))) == "wav"
    assert sniff_media(b"hello world") is None
    for bad in (
        b"",
        b"BMshort",
        PNG_MAGIC + b"\x00\x00\x00\x04IHDRxxxx",
        b"RIFFxxxxWAVEjunk",
    ):
        with pytest.raises(ValueError):
            (decode_png if bad.startswith(PNG_MAGIC) else
             decode_bmp if bad.startswith(b"BM") else
             decode_wav if bad.startswith(b"RIFF") else decode_png)(bad)
    # cut INSIDE the IDAT chunk (8 magic + 25 IHDR chunk = 33; 40 is
    # mid-IDAT) — trailing-IEND truncation is recoverable by design
    truncated = encode_png(img)[:40]
    with pytest.raises(ValueError):
        decode_png(truncated)


def test_resize_nearest_shapes_and_determinism():
    img = _rng(6).integers(0, 256, (10, 7, 3)).astype(np.uint8)
    small = resize_nearest(img, 4, 3)
    assert small.shape == (3, 4, 3)
    assert np.array_equal(small, resize_nearest(img, 4, 3))
    up = resize_nearest(small, 8, 6)
    assert up.shape == (6, 8, 3)
    grey = resize_nearest(img[:, :, 0], 5, 5)
    assert grey.shape == (5, 5)


def test_apng_roundtrip_and_sniff():
    from stock_data_project_spark.operators.codecs import (
        decode_apng,
        encode_apng,
        is_apng,
    )

    rng = _rng(8)
    frames = [rng.integers(0, 256, (6, 5, 3)).astype(np.uint8) for _ in range(4)]
    p = encode_apng(frames, delay_ms=50)
    assert is_apng(p) and sniff_media(p) == "png"  # still a valid PNG stream
    back, delays = decode_apng(p)
    assert len(back) == 4 and all(abs(d - 0.05) < 1e-9 for d in delays)
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)
    # VARYING per-frame delays round-trip individually (not collapsed
    # to the last fcTL's value — the pre-r8 bug)
    pv = encode_apng(frames, delay_ms=[10, 20, 40, 80])
    _, dv = decode_apng(pv)
    assert [round(d, 3) for d in dv] == [0.01, 0.02, 0.04, 0.08]
    # a plain PNG is NOT an APNG, and decode_apng says so loudly
    still = encode_png(frames[0])
    assert not is_apng(still)
    with pytest.raises(ValueError):
        decode_apng(still)
    # decode_png on an APNG yields the default (first) frame
    assert np.array_equal(decode_png(p), frames[0])


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def test_malformed_media_raises_valueerror_never_crashes():
    """Every malformed-container failure mode must surface as
    ValueError — struct.error / zlib.error / TypeError escaping the
    decoder would crash a whole Arrow batch instead of degrading the
    row (the kernels guard with ``except ValueError`` only)."""
    from stock_data_project_spark.operators.codecs import (
        decode_apng,
        encode_apng,
    )

    img = _rng(9).integers(0, 256, (3, 3, 3)).astype(np.uint8)

    # 1. truncated IHDR body (declared length 4 < the 13 the header
    #    needs) — pre-fix: struct.error from struct.unpack
    short_ihdr = PNG_MAGIC + _chunk(b"IHDR", b"\x00\x00\x00\x01") + _chunk(
        b"IDAT", zlib.compress(b"\x00")
    )
    with pytest.raises(ValueError):
        decode_png(short_ihdr)
    with pytest.raises(ValueError):
        decode_apng(short_ihdr)

    # 2. corrupt fdAT deflate stream — pre-fix: zlib.error from the
    #    per-frame decompress
    apng = bytearray(encode_apng([img, img], delay_ms=30))
    i = bytes(apng).find(b"fdAT")
    assert i > 0
    # clobber bytes INSIDE the fdAT body (past the 4-byte seq number)
    apng[i + 8 : i + 12] = b"\xff\x00\xff\x00"
    with pytest.raises(ValueError):
        decode_apng(bytes(apng))

    # 3. fcTL chunk arriving before IHDR — pre-fix: TypeError from
    #    unpack_from on ihdr=None
    fctl_body = struct.pack(">IIIIIHHBB", 0, 3, 3, 0, 0, 30, 1000, 0, 0)
    bad_order = (
        PNG_MAGIC
        + _chunk(b"acTL", struct.pack(">II", 1, 0))
        + _chunk(b"fcTL", fctl_body)
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 30))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_apng(bad_order)

    # 4. truncated fcTL body — pre-fix: struct.error
    apng2 = bytearray(encode_apng([img], delay_ms=30))
    j = bytes(apng2).find(b"fcTL")
    struct.pack_into(">I", apng2, j - 4, 5)  # declare a 5-byte fcTL
    with pytest.raises(ValueError):
        decode_apng(bytes(apng2[: j + 4 + 5 + 4]) + bytes(apng2[j + 4 + 26 + 4 :]))

    # the kernels see these payloads as "not media" and keep the row:
    from stock_data_project_spark.operators.multimodal import _real_features

    assert _real_features(bytes(short_ihdr)) is None


def test_gif_roundtrip_animation_and_palette():
    from stock_data_project_spark.operators.codecs import (
        decode_gif,
        encode_gif,
        is_animated_gif,
    )

    rng = _rng(11)
    pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    frames = [pal[rng.integers(0, 8, (13, 17))] for _ in range(3)]
    g = encode_gif(frames, delay_ms=[30, 60, 90])
    assert sniff_media(g) == "gif" and is_animated_gif(g)
    back, delays = decode_gif(g)
    assert len(back) == 3 and [round(d, 3) for d in delays] == [0.03, 0.06, 0.09]
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)
    # single still: not animated
    assert not is_animated_gif(encode_gif(frames[:1]))
    # >256 distinct colors is a palette-format impossibility: raise
    import pytest as _pytest

    with _pytest.raises(ValueError):
        encode_gif([rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)])


def test_gif_lzw_table_growth_and_reset():
    """128x128 of 256 random palette indices forces code widths to
    12 bits and a mid-stream CLEAR/rebuild — the encoder/decoder
    width-growth lockstep under test."""
    from stock_data_project_spark.operators.codecs import decode_gif, encode_gif

    rng = _rng(12)
    pal256 = np.array(
        [[i, (i * 7) % 256, (i * 13) % 256] for i in range(256)], dtype=np.uint8
    )
    img = pal256[rng.integers(0, 256, (128, 128))]
    back, _ = decode_gif(encode_gif([img]))
    assert np.array_equal(back[0], img)


def test_gif_interlace_region_transparency_disposal():
    """Hand-crafted streams for the decoder features the encoder
    doesn't emit: interlaced row order, a region frame composited
    onto the canvas with a transparent index, and the disposal=3
    refusal."""
    import pytest as _pytest

    from stock_data_project_spark.operators.codecs import (
        _lzw_encode,
        decode_gif,
    )

    def subblocks(data: bytes) -> bytes:
        out = bytearray()
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
        return bytes(out)

    # palette: 4 colors (black, red, green, blue)
    pal = b"\x00\x00\x00" + b"\xff\x00\x00" + b"\x00\xff\x00" + b"\x00\x00\xff"
    head = b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0) + pal

    # -- interlaced 4x4: stored row order is passes (0), (2), (1,3)
    rows = np.array(
        [[1, 1, 1, 1], [2, 2, 2, 2], [3, 3, 3, 3], [0, 1, 2, 3]], dtype=np.int32
    )
    stored = np.vstack([rows[0], rows[2], rows[1], rows[3]])  # 8s,4s,2s,1s for h=4 → [0],[2],[1,3]
    lzw = _lzw_encode(2, stored.reshape(-1).tolist())
    gif = (
        head
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0x40)
        + bytes([2])
        + subblocks(lzw)
        + b"\x3b"
    )
    frames, _ = decode_gif(gif)
    pal_np = np.frombuffer(pal, dtype=np.uint8).reshape(4, 3)
    assert np.array_equal(frames[0], pal_np[rows])

    # -- frame 2 is a 2x2 region at (1,1) with index 0 transparent:
    # transparent cells keep frame 1's pixels
    full = np.zeros((4, 4), dtype=np.int32) + 2  # all green
    region = np.array([[1, 0], [0, 3]], dtype=np.int32)
    gce = struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x01, 5, 0, 0)  # transparent=0
    gif2 = (
        head
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0)
        + bytes([2])
        + subblocks(_lzw_encode(2, full.reshape(-1).tolist()))
        + gce
        + struct.pack("<BHHHHB", 0x2C, 1, 1, 2, 2, 0)
        + bytes([2])
        + subblocks(_lzw_encode(2, region.reshape(-1).tolist()))
        + b"\x3b"
    )
    frames2, delays2 = decode_gif(gif2)
    assert len(frames2) == 2 and round(delays2[1], 2) == 0.05
    want = pal_np[full].copy()
    want[1, 1] = pal_np[1]  # red drawn
    want[2, 2] = pal_np[3]  # blue drawn
    # (1,2) and (2,1) were transparent → still green
    assert np.array_equal(frames2[1], want)

    # -- disposal=3 refuses
    gce3 = struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 3 << 2, 5, 0, 0)
    gif3 = (
        head
        + gce3
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0)
        + bytes([2])
        + subblocks(_lzw_encode(2, full.reshape(-1).tolist()))
        + b"\x3b"
    )
    with _pytest.raises(ValueError):
        decode_gif(gif3)


def test_gif_malformed_raises_valueerror():
    import pytest as _pytest

    from stock_data_project_spark.operators.codecs import decode_gif, encode_gif

    rng = _rng(13)
    pal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    good = encode_gif([pal[rng.integers(0, 4, (6, 6))]])
    for bad in (
        b"GIF89a",                          # truncated header
        good[:20],                          # cut inside palette/descriptor
        good[:-1],                          # missing trailer
        good[:-10],                         # cut inside LZW data
        b"GIF89a" + b"\xff" * 30,           # garbage blocks
    ):
        with _pytest.raises(ValueError):
            decode_gif(bad)
    # corrupt LZW body: clobber bytes mid-stream
    b = bytearray(good)
    b[-8:-4] = b"\xff\xff\xff\xff"
    with _pytest.raises(ValueError):
        decode_gif(bytes(b))


def test_jpeg_roundtrip_444_and_420():
    """Baseline JPEG round-trips with small error on smooth images
    (lossy by design — assert mean abs error, exact dims) for both
    4:4:4 and 4:2:0, at two qualities."""
    from stock_data_project_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:21, 0:19]  # non-multiple-of-8/16 dims: pad+crop
    img = np.stack(
        [(xx * 5 + yy * 3) % 256, (xx * 2 + 90) % 256, (yy * 7 + 40) % 256],
        axis=-1,
    ).astype(np.uint8)
    for subsample in (False, True):
        for q, bound in ((95, 2.0), (75, 5.0)):
            back = decode_jpeg(encode_jpeg(img, quality=q, subsample=subsample))
            assert back.shape == img.shape
            err = np.abs(back.astype(int) - img.astype(int)).mean()
            assert err < bound, (subsample, q, err)
    # determinism: encode twice, identical bytes
    assert encode_jpeg(img, quality=80) == encode_jpeg(img, quality=80)
    # grey input widens to 3 channels like the other image codecs
    g = _rng(31).integers(0, 256, (9, 11)).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(g, quality=95))
    assert back.shape == (9, 11, 3)


def test_jpeg_sniff_and_malformed():
    import pytest as _pytest

    from stock_data_project_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )

    img = _rng(32).integers(0, 256, (8, 8, 3)).astype(np.uint8)
    j = encode_jpeg(img, quality=90)
    assert sniff_media(j) == "jpeg"
    for bad in (
        b"\xff\xd8\xff",            # header only
        j[:30],                     # cut inside tables
        j[:-20],                    # cut inside the entropy stream
        # SOF2-relabeled baseline: its scan header (Ss=0, Se=63) is
        # invalid for a progressive DC scan, so this must still refuse
        j.replace(b"\xff\xc0", b"\xff\xc2", 1),
    ):
        with _pytest.raises(ValueError):
            decode_jpeg(bad)
    # >2x2 sampling factors refused, not crashed
    b2 = bytearray(j)
    i = bytes(b2).find(b"\xff\xc0")
    b2[i + 12] = 0x55  # Y component h=5, v=5
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(b2))


def test_jpeg_through_spark_kernels(spark):
    """A genuine JPEG payload is really decoded by the feature kernel
    (dims/channels + stats within JPEG loss of the source) and really
    resized by the resize kernel (output is a decodable JPEG of the
    target dims)."""
    import numpy as np

    from stock_data_project_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
    )
    from stock_data_project_spark.operators.multimodal import (
        extract_features,
        resize_media,
    )

    yy, xx = np.mgrid[0:12, 0:10]
    img = np.stack(
        [(xx * 9) % 256, (yy * 11) % 256, ((xx + yy) * 6) % 256], axis=-1
    ).astype(np.uint8)
    j = encode_jpeg(img, quality=95)
    df = spark.createDataFrame(
        [(1, bytearray(j), ("image", len(j), 0))],
        "doc_id long, payload binary, "
        "meta struct<media_type:string, n_bytes:long, checksum:long>",
    )
    [feat] = extract_features(df).collect()
    assert feat.features[:4] == [2.0, 12.0, 10.0, 3.0]
    want_mean = float(img.astype(np.float64).mean()) / 255.0
    assert abs(feat.features[4] - want_mean) < 0.02  # JPEG loss budget
    [out] = resize_media(df, width=5, height=4).collect()
    back = decode_jpeg(bytes(out.payload))
    assert back.shape == (4, 5, 3)


def test_jpeg_progressive_pixel_identical_to_baseline():
    """Successive approximation reconstructs coefficients EXACTLY, so
    progressive decode must match baseline decode pixel-for-pixel at
    the same quality/subsampling — across odd dims (pad blocks +
    non-interleaved rasters diverge there), qualities, and 4:2:0.
    This pins BOTH the 8-scan encoder script and every decoder scan
    path (DC first/refine, AC first/refine, EOB runs, ZRL with
    correction bits)."""
    from stock_data_project_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = _rng(42)
    for shape in ((8, 8), (17, 23), (33, 31)):
        yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
        img = (
            rng.integers(0, 256, (*shape, 3)).astype(int)
            + (80 * np.sin(xx / 5))[:, :, None]
            + (60 * np.cos(yy / 7))[:, :, None]
        ).clip(0, 255).astype(np.uint8)
        for q in (50, 95):
            for sub in (False, True):
                base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
                prog = decode_jpeg(
                    encode_jpeg_progressive(img, quality=q, subsample=sub)
                )
                assert np.array_equal(base, prog), (shape, q, sub)
    # determinism + sniff + grayscale widening
    g = rng.integers(0, 256, (9, 11)).astype(np.uint8)
    p = encode_jpeg_progressive(g, quality=95)
    assert p == encode_jpeg_progressive(g, quality=95)
    assert sniff_media(p) == "jpeg"
    assert decode_jpeg(p).shape == (9, 11, 3)


def test_jpeg_progressive_malformed_discipline():
    """Truncations and byte corruptions of a progressive stream must
    surface as ValueError (or decode cleanly) — never any other
    exception class, per the kernels' row-degrade contract."""
    import pytest as _pytest

    from stock_data_project_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    img = _rng(7).integers(0, 256, (24, 17, 3)).astype(np.uint8)
    p = encode_jpeg_progressive(img, quality=85)
    with _pytest.raises(ValueError):
        decode_jpeg(p[:40])  # cut inside the tables
    for cut in range(50, len(p), 97):
        try:
            decode_jpeg(p[:cut])
        except ValueError:
            pass  # refused cleanly
    for i in range(2, len(p), 41):
        b = bytearray(p)
        b[i] ^= 0xFF
        try:
            decode_jpeg(bytes(b))
        except ValueError:
            pass  # refused cleanly


def test_jpeg_progressive_through_media_kernels(spark):
    """A progressive payload flows through the Arrow-batched feature
    kernel exactly like a baseline one (sniffed as jpeg, REALLY
    decoded - the dims in the feature head prove it)."""
    from stock_data_project_spark.operators.codecs import (
        encode_jpeg_progressive,
    )
    from stock_data_project_spark.operators.multimodal import extract_features

    img = _rng(90).integers(0, 256, (32, 16, 3)).astype(np.uint8)
    payload = encode_jpeg_progressive(img, quality=95)
    df = spark.createDataFrame(
        [(1, bytearray(payload), ("image", len(payload), 0))],
        "doc_id long, payload binary, "
        "meta struct<media_type:string, n_bytes:long, checksum:long>",
    )
    [feat] = extract_features(df).collect()
    assert feat.features[:4] == [2.0, 32.0, 16.0, 3.0]


def test_jpeg_progressive_restart_markers():
    """restart_interval emits DRI + per-scan RST markers; the decoder's
    restart machinery (byte realign, DC-prediction reset, EOB-run
    close) must reproduce the exact non-restart pixels — including the
    hostile interval-1 case (a marker after EVERY MCU/block)."""
    from stock_data_project_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = _rng(11)
    for sub in (False, True):
        img = rng.integers(0, 256, (33, 31, 3)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=88, subsample=sub))
        for dri in (1, 3):
            p = encode_jpeg_progressive(
                img, quality=88, subsample=sub, restart_interval=dri
            )
            assert b"\xff\xdd" in p  # DRI present
            assert np.array_equal(decode_jpeg(p), base), (sub, dri)


def test_jpeg_fill_bytes_and_restart_strictness():
    """ITU T.81 B.1.1.2: 0xFF fill bytes before a marker are legal —
    a libjpeg-style padded stream must decode to the same pixels.
    Conversely the restart machinery must REFUSE (ValueError, the
    kernels' degrade contract) when DRI promises markers the stream
    does not deliver (r10 ADVICE: refuse, never silently resync)."""
    import pytest as _pytest

    from stock_data_project_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    img = _rng(77).integers(0, 256, (17, 13, 3)).astype(np.uint8)
    j = encode_jpeg(img, quality=90)
    want = decode_jpeg(j)
    # pad fill bytes before the DQT marker and before EOI
    i = j.find(b"\xff\xdb")
    padded = j[:i] + b"\xff\xff" + j[i:]
    assert padded.endswith(b"\xff\xd9")
    padded = padded[:-2] + b"\xff\xff\xff" + b"\xff\xd9"
    assert np.array_equal(decode_jpeg(padded), want)
    # progressive with restarts: strip the RST markers (0xFFD0-D7)
    # from the entropy stream -> the decoder must refuse, not desync
    p = encode_jpeg_progressive(img, quality=90, restart_interval=1)
    stripped = bytearray()
    k = 0
    while k < len(p):
        if p[k] == 0xFF and k + 1 < len(p) and 0xD0 <= p[k + 1] <= 0xD7:
            k += 2
            continue
        stripped.append(p[k])
        k += 1
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(stripped))
