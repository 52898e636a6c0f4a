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
- GIF  — real LZW (variable-width codes, clear/EOI, deferred-clear
  tolerant), 87a/89a, global+local palettes, interlace, per-frame
  Graphic Control delays, transparency compositing for disposal
  none/keep; disposal=3 (restore-previous) raises rather than
  compositing wrong. The encoder emits true LZW with a global
  palette (≤256 distinct colors; more raises ValueError).

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
GIF_MAGICS = (b"GIF87a", b"GIF89a")


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
    """'png' | 'bmp' | 'wav' | 'gif' | None by magic bytes."""
    if payload.startswith(PNG_MAGIC):
        return "png"
    if payload.startswith(BMP_MAGIC):
        return "bmp"
    if payload.startswith(WAV_MAGIC) and payload[8:12] == b"WAVE":
        return "wav"
    if payload.startswith(GIF_MAGICS):
        return "gif"
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


# ---------------------------------------------------------------- GIF

_GIF_MAX_CODE = 4096  # 12-bit LZW ceiling (the format constant)


def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """GIF-variant LZW: LSB-first variable-width codes, CLEAR resets
    the table, EOI ends the stream; a full table with no CLEAR
    ("deferred clear") keeps decoding with the table frozen."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = {i: (i,) for i in range(clear)}
    table: dict[int, tuple[int, ...]] = dict(base)
    width = min_code_size + 1
    next_code = eoi + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while True:
        if bitpos + width > total_bits:
            raise ValueError("LZW stream ended without EOI")
        byte_i, bit_o = divmod(bitpos, 8)
        window = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (window >> bit_o) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = dict(base)
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError(f"bad first LZW code {code}")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + (prev[0],)  # the KwKwK special case
        else:
            raise ValueError(f"LZW code {code} out of sequence")
        out.extend(entry)
        if prev is not None and next_code < _GIF_MAX_CODE:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    """True LZW (not the clear-code-spam "uncompressed" trick),
    emitting CLEAR + rebuilding when the table fills — round-trips
    through _lzw_decode and any standard GIF reader."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits: list[int] = []  # (value, width) packed LSB-first below
    widths: list[int] = []

    def emit(code: int, width: int) -> None:
        bits.append(code)
        widths.append(width)

    table = {(i,): i for i in range(clear)}
    width = min_code_size + 1
    next_code = eoi + 1
    emit(clear, width)
    buf: tuple[int, ...] = ()
    for px in indices:
        px = int(px)
        if not 0 <= px < clear:
            raise ValueError("palette index out of range for code size")
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code < _GIF_MAX_CODE:
            table[cand] = next_code
            next_code += 1
            # the decoder widens when ITS next_code (one behind ours
            # at the same emission index) reaches 2^width
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:  # table full: reset so both sides rebuild in lockstep
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
        buf = (px,)
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    acc = 0
    nbits = 0
    payload = bytearray()
    for code, w in zip(bits, widths):
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        payload.append(acc & 0xFF)
    return bytes(payload)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [r for start, step in _GIF_INTERLACE_PASSES for r in range(start, h, step)]
    out = np.empty_like(rows)
    out[order] = rows
    return out


@_malformed_raises_valueerror
def decode_gif(payload: bytes) -> tuple[list[np.ndarray], list[float]]:
    """(RGB frames, per-frame delay seconds) from a GIF87a/89a.
    Region frames composite onto the running canvas (disposal none/
    keep, honoring the Graphic Control transparency index); disposal
    2 restores the background; disposal 3 (restore-previous) raises
    ValueError rather than compositing wrong."""
    if not payload.startswith(GIF_MAGICS):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, bg_index, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    if w == 0 or h == 0:
        raise ValueError("bad dimensions")
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = np.frombuffer(
            payload, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if global_pal is not None and bg_index < len(global_pal):
        canvas[:] = global_pal[bg_index]
    background = canvas.copy()
    frames: list[np.ndarray] = []
    delays: list[float] = []
    delay_cs = 0
    transparent: int | None = None
    disposal = 0
    while True:
        if pos >= len(payload):
            raise ValueError("GIF ended without trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control
                size = payload[pos]
                if size != 4:
                    raise ValueError("bad Graphic Control block")
                flags, delay_cs = struct.unpack_from("<BH", payload, pos + 1)
                transparent = payload[pos + 4] if flags & 0x01 else None
                disposal = (flags >> 2) & 0x07
                if disposal == 3:
                    raise ValueError("GIF disposal=3 (restore previous) unsupported")
                pos += 1 + size
            else:  # skip any other extension's sub-blocks
                pass
            while True:  # terminator-walk the sub-blocks
                size = payload[pos]
                pos += 1
                if size == 0:
                    break
                pos += size
        elif block == 0x2C:  # image descriptor
            fx, fy, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            if fx + fw > w or fy + fh > h or fw == 0 or fh == 0:
                raise ValueError("frame exceeds canvas")
            pal = global_pal
            if fpacked & 0x80:
                n = 2 << (fpacked & 0x07)
                pal = np.frombuffer(
                    payload, dtype=np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("no color table for frame")
            min_code_size = payload[pos]
            pos += 1
            data = bytearray()
            while True:
                size = payload[pos]
                pos += 1
                if size == 0:
                    break
                chunk = payload[pos : pos + size]
                if len(chunk) != size:
                    raise ValueError("truncated GIF data sub-block")
                data += chunk
                pos += size
            idx = _lzw_decode(min_code_size, bytes(data))
            if len(idx) < fw * fh:
                raise ValueError("LZW output shorter than frame")
            grid = np.asarray(idx[: fw * fh], dtype=np.int32).reshape(fh, fw)
            if fpacked & 0x40:
                grid = _deinterlace(grid)
            if int(grid.max()) >= len(pal):
                raise ValueError("palette index out of range")
            region = canvas[fy : fy + fh, fx : fx + fw]
            rgb = pal[grid]
            if transparent is not None:
                mask = (grid != transparent)[:, :, None]
                rgb = np.where(mask, rgb, region)
            canvas[fy : fy + fh, fx : fx + fw] = rgb
            frames.append(canvas.copy())
            delays.append(delay_cs / 100.0)
            if disposal == 2:  # restore region to background
                canvas[fy : fy + fh, fx : fx + fw] = background[
                    fy : fy + fh, fx : fx + fw
                ]
            transparent = None
            disposal = 0
            delay_cs = 0
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF has no image data")
    return frames, delays


def encode_gif(
    frames: list[np.ndarray], delay_ms: int | list[int] = 100
) -> bytes:
    """GIF89a from same-shaped (h, w, 3) uint8 RGB frames sharing a
    ≤256-color global palette (more distinct colors raises ValueError
    — this is a palette format; quantization is out of scope). Real
    LZW compression, full-canvas frames, per-frame delays."""
    if not frames:
        raise ValueError("encode_gif wants >= 1 frame")
    fs = []
    for f in frames:
        a = np.asarray(f, dtype=np.uint8)
        if a.ndim == 2:
            a = np.repeat(a[:, :, None], 3, axis=2)
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("encode_gif wants (h, w, 3) frames")
        fs.append(a)
    h, w, _ = fs[0].shape
    for a in fs:
        if a.shape != (h, w, 3):
            raise ValueError("all frames must share one shape")
    per_frame = (
        list(delay_ms) if isinstance(delay_ms, (list, tuple)) else [delay_ms] * len(fs)
    )
    if len(per_frame) != len(fs):
        raise ValueError("need one delay per frame")
    # global palette = sorted distinct colors across all frames
    stacked = np.concatenate([a.reshape(-1, 3) for a in fs])
    palette = np.unique(stacked, axis=0)  # sorted lexicographically
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} distinct colors > GIF's 256")
    pal_size_pow = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    n_pal = 1 << pal_size_pow
    pal_bytes = np.zeros((n_pal, 3), dtype=np.uint8)
    pal_bytes[: len(palette)] = palette
    # color → index lookup via a packed-int sort
    packed_pal = (
        palette[:, 0].astype(np.int64) << 16
    ) | (palette[:, 1].astype(np.int64) << 8) | palette[:, 2].astype(np.int64)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pal_size_pow - 1) & 0x07), 0, 0)
    out += pal_bytes.tobytes()
    min_code_size = max(2, pal_size_pow)
    for a, d_ms in zip(fs, per_frame):
        out += struct.pack(
            "<BBBBHBB", 0x21, 0xF9, 4, 0, max(0, int(d_ms)) // 10, 0, 0
        )
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(min_code_size)
        packed_px = (
            a[:, :, 0].astype(np.int64) << 16
        ) | (a[:, :, 1].astype(np.int64) << 8) | a[:, :, 2].astype(np.int64)
        idx = np.searchsorted(packed_pal, packed_px.reshape(-1))
        data = _lzw_encode(min_code_size, idx.tolist())
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def is_animated_gif(payload: bytes) -> bool:
    """GIF magic + more than one image descriptor (cheap block walk;
    malformed streams just report False — decode_gif is the
    authority)."""
    if not payload.startswith(GIF_MAGICS):
        return False
    try:
        frames, _ = decode_gif(payload)
    except ValueError:
        return False
    return len(frames) > 1
