"""Stdlib-only media codecs: real WAV / BMP / PNG decode (and the
matching encoders the tests use to synthesize genuine payloads).

The container ships no PIL/cv2/ffmpeg/soundfile (probed every round
since r3) — but the standard library already covers three real
formats end-to-end:

- WAV  — ``wave`` + ``struct``: PCM 8/16/32-bit, any channel count.
- BMP  — ``struct``: the uncompressed 24-bit BI_RGB variant (the
  format's overwhelmingly common case), bottom-up row order,
  4-byte-padded rows.
- PNG  — ``zlib`` + ``struct``: 8-bit RGB/RGBA/greyscale,
  non-interlaced, with ALL FIVE scanline filters (None/Sub/Up/
  Average/Paeth) implemented in the decoder; the encoder emits
  filter 0 scanlines.
- APNG — the PNG standard's animation chunks (acTL/fcTL/fdAT) in
  the full-frame simple profile: real multi-frame decode with
  per-frame delays, reusing the PNG scanline machinery — which
  makes ``sample_frames`` genuinely decode animations.

These plug into operators/multimodal.py's Arrow-batched kernels via
magic-byte sniffing, replacing the deterministic fakes for payloads
that really are media. JPEG and inter-frame compressed video
(H.26x/VP9) stay out of scope (entropy/motion decoders aren't a
reasonable reimplementation) — the honest remaining stub surface.

All decode functions return numpy arrays (pixels uint8, samples
int32) and raise ``ValueError`` on malformed/unsupported input —
callers (the kernels) degrade the ROW, never the batch.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
BMP_MAGIC = b"BM"
WAV_MAGIC = b"RIFF"


def _malformed_raises_valueerror(fn):
    """Normalize the exception surface of a decoder to ValueError.

    Malformed containers surface as struct.error (short chunk bodies),
    zlib.error (corrupt deflate streams), or TypeError (chunks arriving
    before the header they depend on, e.g. fcTL before IHDR) — all of
    which would escape callers' ``except ValueError`` row-degrade guards
    and crash the whole Arrow batch. The module contract is
    ValueError-on-malformed, so convert here, once, for every decoder.
    """

    def wrapped(payload: bytes):
        try:
            return fn(payload)
        except ValueError:
            raise
        except (struct.error, zlib.error, TypeError, IndexError) as e:
            raise ValueError(f"malformed media: {e}") from e

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped


def sniff_media(payload: bytes) -> str | None:
    """'png' | 'bmp' | 'wav' | None by magic bytes."""
    if payload.startswith(PNG_MAGIC):
        return "png"
    if payload.startswith(BMP_MAGIC):
        return "bmp"
    if payload.startswith(WAV_MAGIC) and payload[8:12] == b"WAVE":
        return "wav"
    return None


# ---------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """PCM16 WAV bytes from (n,) or (n, channels) int16-ish array."""
    import io
    import wave

    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    arr = arr.astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, (n_frames, n_channels) int32 array) from PCM
    WAV bytes (8/16/32-bit widths)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            width, nch, rate = w.getsampwidth(), w.getnchannels(), w.getframerate()
            raw = w.readframes(w.getnframes())
    except Exception as e:  # wave raises wave.Error / EOFError
        raise ValueError(f"bad wav: {e}") from e
    if width == 1:
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    elif width == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif width == 4:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.int32)
    else:
        raise ValueError(f"unsupported wav sample width {width}")
    if nch <= 0 or arr.size % nch:
        raise ValueError("frame/channel mismatch")
    return rate, arr.reshape(-1, nch)


# ---------------------------------------------------------------- BMP


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Uncompressed 24-bit BI_RGB BMP from an (h, w, 3) uint8 RGB
    array (stored bottom-up, BGR, rows padded to 4 bytes — the
    format's on-disk convention)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp wants (h, w, 3)")
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    body = b"".join(
        px[r, :, ::-1].tobytes() + b"\0" * pad for r in range(h - 1, -1, -1)
    )
    pixel_offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", pixel_offset + len(body), 0, 0, pixel_offset
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + body


@_malformed_raises_valueerror
def decode_bmp(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from an uncompressed 24-bit BI_RGB BMP
    (top-down or bottom-up)."""
    if len(payload) < 54 or payload[:2] != BMP_MAGIC:
        raise ValueError("not a BMP")
    pixel_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    top_down = h_raw < 0
    h = abs(h_raw)
    if w <= 0 or h == 0:
        raise ValueError("bad dimensions")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = pixel_offset + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=pixel_offset
    ).reshape(h, stride)[:, :row_bytes]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img if top_down else img[::-1]


# ---------------------------------------------------------------- PNG

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # grey, RGB, grey+A, RGBA


def encode_png(pixels: np.ndarray) -> bytes:
    """8-bit non-interlaced PNG from (h, w) grey or (h, w, c) with
    c ∈ {1, 2, 3, 4}; scanlines use filter 0."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 2, 3, 4):
        raise ValueError("encode_png wants (h, w[, c<=4])")
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\0" + px[r].tobytes() for r in range(h))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4). raw is the inflated
    stream: h rows of (1 filter byte + stride data bytes)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    for r in range(h):
        ftype = int(rows[r, 0])
        line = rows[r, 1:].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a scan
            cur = np.empty(stride, np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[r] = cur.astype(np.uint8)
    return out


@_malformed_raises_valueerror
def decode_png(payload: bytes) -> np.ndarray:
    """(h, w, c) uint8 from an 8-bit non-interlaced PNG (grey /
    grey+alpha / RGB / RGBA), all five scanline filters supported."""
    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    pos, ihdr, idat = len(PNG_MAGIC), None, b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or interlace or comp or filt or color_type not in _PNG_CHANNELS:
        raise ValueError("only 8-bit non-interlaced grey/RGB/alpha PNG supported")
    c = _PNG_CHANNELS[color_type]
    stride = w * c
    try:
        raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    except zlib.error as e:
        raise ValueError(f"bad IDAT: {e}") from e
    if raw.size != h * (stride + 1):
        raise ValueError("inflated size mismatch")
    return _unfilter(raw, h, stride, c).reshape(h, w, c)


# ------------------------------------------------------------ resize


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of (h, w[, c]) to (height, width[, c])
    — pure index arithmetic, deterministic."""
    px = np.asarray(pixels)
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return px[rows][:, cols]


# ------------------------------------------------------- APNG (animation)


def encode_apng(
    frames: list[np.ndarray], delay_ms: int | list[int] = 100
) -> bytes:
    """Animated PNG from same-shaped 8-bit frames (full-frame
    updates: dispose_op=0, blend_op=0 — the simple profile this
    module's decoder supports). Frame 0 rides the default IDAT;
    later frames are fdAT chunks. ``delay_ms`` may be a single
    cadence or one delay per frame. A real public standard (the PNG
    third edition's animation chunks), decodable by any browser."""
    if not frames:
        raise ValueError("encode_apng wants >= 1 frame")
    per_frame = (
        list(delay_ms) if isinstance(delay_ms, (list, tuple)) else [delay_ms] * len(frames)
    )
    if len(per_frame) != len(frames):
        raise ValueError("need one delay per frame")
    px0 = np.asarray(frames[0], dtype=np.uint8)
    if px0.ndim == 2:
        px0 = px0[:, :, None]
    h, w, c = px0.shape
    if c not in (1, 2, 3, 4):
        raise ValueError("unsupported channel count")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    def raw(pix: np.ndarray) -> bytes:
        p = np.asarray(pix, dtype=np.uint8)
        if p.ndim == 2:
            p = p[:, :, None]
        if p.shape != (h, w, c):
            raise ValueError("all frames must share the first frame's shape")
        return zlib.compress(b"".join(b"\0" + p[r].tobytes() for r in range(h)))

    def fctl(seq: int, d_ms: int) -> bytes:
        return chunk(
            b"fcTL",
            struct.pack(
                ">IIIIIHHBB", seq, w, h, 0, 0, d_ms, 1000, 0, 0
            ),
        )

    out = PNG_MAGIC + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    )
    out += chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    out += fctl(seq, per_frame[0])
    seq += 1
    out += chunk(b"IDAT", raw(frames[0]))
    for f, d_ms in zip(frames[1:], per_frame[1:]):
        out += fctl(seq, d_ms)
        seq += 1
        out += chunk(b"fdAT", struct.pack(">I", seq) + raw(f))
        seq += 1
    return out + chunk(b"IEND", b"")


def is_apng(payload: bytes) -> bool:
    """PNG magic + an acTL chunk before the first IDAT."""
    if not payload.startswith(PNG_MAGIC):
        return False
    pos = len(PNG_MAGIC)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        if tag == b"acTL":
            return True
        if tag in (b"IDAT", b"IEND"):
            return False
        pos += 12 + length
    return False


@_malformed_raises_valueerror
def decode_apng(payload: bytes) -> tuple[list[np.ndarray], list[float]]:
    """(frames, per_frame_delay_seconds) from an APNG in the full-frame
    simple profile (every fcTL covers the whole canvas at offset 0 with
    dispose/blend 0 — what encode_apng emits). delays[i] is frame i's
    OWN fcTL display duration (they may differ frame to frame);
    timestamps are its cumulative prefix sum. Raises ValueError on
    region/delta frames rather than silently compositing wrong, and on
    any malformed chunk (struct/zlib/ordering errors are normalized)."""
    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    pos = len(PNG_MAGIC)
    ihdr = None
    delays: list[float] = []  # one per fcTL, in frame order
    streams: list[bytes] = []  # zlib stream per frame, in order
    saw_fctl_for_default = False
    n_declared = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated APNG chunk")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"acTL":
            n_declared = struct.unpack_from(">I", body, 0)[0]
        elif tag == b"fcTL":
            _, fw, fh, x, y, dnum, dden, dispose, blend = struct.unpack(
                ">IIIIIHHBB", body
            )
            w, h = struct.unpack_from(">II", ihdr, 0)
            if (fw, fh, x, y) != (w, h, 0, 0) or dispose or blend:
                raise ValueError("only full-frame simple-profile APNG supported")
            delays.append(dnum / (dden or 100.0))
            if not streams:
                saw_fctl_for_default = True
            streams.append(b"")
        elif tag == b"IDAT":
            if not streams:  # plain PNG or default image not a frame
                streams.append(b"")
            streams[-1] += body
        elif tag == b"fdAT":
            if not streams:
                raise ValueError("fdAT before fcTL")
            streams[-1] += body[4:]  # strip sequence number
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or n_declared is None or not saw_fctl_for_default:
        raise ValueError("not a (simple-profile) APNG")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or interlace or comp or filt or color_type not in _PNG_CHANNELS:
        raise ValueError("unsupported APNG pixel format")
    c = _PNG_CHANNELS[color_type]
    stride = w * c
    frames = []
    for s in streams:
        raw = np.frombuffer(zlib.decompress(s), dtype=np.uint8)
        if raw.size != h * (stride + 1):
            raise ValueError("frame size mismatch")
        frames.append(_unfilter(raw, h, stride, c).reshape(h, w, c))
    if n_declared != len(frames) or len(delays) != len(frames):
        raise ValueError("acTL frame count mismatch")
    return frames, delays
