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

- JPEG — baseline sequential (SOF0, r8) AND progressive (SOF2, r10),
  numpy + ``struct``: real Huffman entropy coding, 4:4:4 / 4:2:2 /
  4:2:0, restart markers, multi-scan spectral selection + successive
  approximation with EOB-run coding; baseline interop-validated
  against real libjpeg files, progressive pinned pixel-identical to
  baseline through the repo's own 8-scan progressive encoder. See
  the JPEG section header for the full surface.

These plug into operators/multimodal.py's Arrow-batched kernels via
magic-byte sniffing, replacing the deterministic fakes for payloads
that really are media. Inter-frame compressed video (H.26x/VP9)
stays out of scope (the motion-compensation machinery isn't a
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
JPEG_MAGIC = b"\xff\xd8\xff"


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
    """'png' | 'bmp' | 'wav' | 'gif' | 'jpeg' | None by magic bytes."""
    if payload.startswith(PNG_MAGIC):
        return "png"
    if payload.startswith(BMP_MAGIC):
        return "bmp"
    if payload.startswith(WAV_MAGIC) and payload[8:12] == b"WAVE":
        return "wav"
    if payload.startswith(GIF_MAGICS):
        return "gif"
    if payload.startswith(JPEG_MAGIC):
        return "jpeg"
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


# --------------------------------------------------------------- JPEG
# Baseline sequential JPEG (SOF0), pure numpy + struct — the last
# image-format blocker lifted (r8): real Huffman entropy decode (any
# valid canonical tables, byte stuffing, restart markers), DQT 8/16-bit,
# sampling factors to 2x2 (4:4:4 / 4:2:2 / 4:2:0) with replication
# upsampling, floating IDCT, JFIF full-range YCbCr. The encoder emits
# 4:4:4 or 4:2:0 with quality-scaled Annex-K quant tables and
# fixed-length canonical Huffman tables (valid per the spec, not
# size-optimal — tables ride in DHT, so any decoder reads them).
# Interop validated against real libjpeg-encoded files (including a
# 477x720 4:2:0 photo).
#
# Progressive (SOF2) decode landed r10: multi-scan coefficient
# accumulation with spectral selection AND successive approximation —
# DC first/refine (interleaved or single-component), AC first/refine
# with EOB-run coding, ZRL-with-correction-bits, and per-scan restart
# handling — the scan algorithms are faithful ports of ITU T.81
# §G.1.2/G.2 (the same algorithms libjpeg's jdphuff.c implements).
# ``encode_jpeg_progressive`` emits a real 8-scan successive-
# approximation script (DC Al=1 → AC firsts Al=1 → DC refine → AC
# refines), which makes every decoder scan path testable end-to-end:
# successive approximation reconstructs coefficients EXACTLY, so
# progressive decode must be pixel-identical to baseline decode of
# the same image at the same quality (asserted in tests). The honest
# remaining seam is inter-frame video (H.26x/VP9), documented at the
# module head.

# ---- shared constants ------------------------------------------------


def _zigzag() -> np.ndarray:
    idx = sorted(
        ((i, j) for i in range(8) for j in range(8)),
        key=lambda p: (p[0] + p[1], p[0] if (p[0] + p[1]) % 2 else -p[0]),
    )
    return np.array([i * 8 + j for i, j in idx], dtype=np.int64)


ZIGZAG = _zigzag()          # natural index of the k-th zigzag coef
INV_ZIGZAG = np.argsort(ZIGZAG)

_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def fdct(block: np.ndarray) -> np.ndarray:
    return _D @ block @ _D.T


def idct(coef: np.ndarray) -> np.ndarray:
    return _D.T @ coef @ _D


# base luma/chroma quant tables (JPEG Annex K — public spec constants),
# in natural (row-major) order
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 / quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * s + 50) / 100)
    return np.clip(q, 1, 255)


# ---- bit IO ----------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.buf)

    def restart(self, m: int) -> None:
        """Byte-align with 1-bits (stuffed like any entropy byte) and
        emit RST(m mod 8) — markers are raw, never stuffed."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, 0xD0 + (m % 8)])


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream exhausted")
        b = self.data[self.pos]
        self.pos += 1
        self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map a `size`-bit magnitude to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _mag_bits(v: int) -> tuple[int, int]:
    """signed value -> (size, magnitude bits) per the JPEG encoding."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


# ---- canonical Huffman -----------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """DHT (BITS, HUFFVAL) -> {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    def __init__(self, bits: list[int], vals: list[int]):
        # mincode/maxcode/valptr per length (the spec's F.16 method)
        self.bits = bits
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            else:
                self.maxcode[length] = -1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.read_bit()
        length = 1
        while code > self.maxcode[length]:
            if length >= 16:
                raise ValueError("bad JPEG Huffman code")
            code = (code << 1) | br.read_bit()
            length += 1
        return self.vals[self.valptr[length] + code - self.mincode[length]]


# ---- encoder ---------------------------------------------------------

# fixed-length canonical tables: DC 12 symbols @ 4 bits, AC 162 @ 8
_DC_SYMS = list(range(12))
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_AC_SYMS = [
    (r << 4) | s for r in range(16) for s in range(1, 11)
] + [0x00, 0xF0]
_AC_SYMS = sorted(set(_AC_SYMS))
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_SYMS)  # all at length 8

# progressive AC table: the baseline symbols plus the EOB-run symbols
# (r << 4 | 0 for r = 1..14 — EOBRUN lengths 2..2^14; 0x00 is EOB-1 and
# already present). 176 codes all at length 8 stay canonical (last code
# 175 < 255, so the all-ones code is never assigned).
_AC_SYMS_PROG = sorted(set(_AC_SYMS) | {r << 4 for r in range(1, 15)})
_AC_BITS_PROG = [0] * 16
_AC_BITS_PROG[7] = len(_AC_SYMS_PROG)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _pad_to(img: np.ndarray, mh: int, mv: int) -> np.ndarray:
    h, w = img.shape
    ph = (-h) % mv
    pw = (-w) % mh
    return np.pad(img, ((0, ph), (0, pw)), mode="edge")


def _encode_blocks(
    plane: np.ndarray, q: np.ndarray, bw: _BitWriter, dc_codes, ac_codes, pred: int
) -> int:
    """Encode one 8x8-tiled plane block row-major; returns new DC pred."""
    h, w = plane.shape
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            block = plane[by : by + 8, bx : bx + 8] - 128.0
            coef = np.round(fdct(block) / q.reshape(8, 8)).astype(np.int64)
            zz = coef.reshape(-1)[ZIGZAG]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            size, bits = _mag_bits(diff)
            c, ln = dc_codes[size]
            bw.write(c, ln)
            if size:
                bw.write(bits, size)
            run = 0
            last_nz = 0
            nz = np.flatnonzero(zz[1:])
            last_nz = nz[-1] + 1 if len(nz) else 0
            for i in range(1, last_nz + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[0xF0]
                    bw.write(c, ln)
                    run -= 16
                size, bits = _mag_bits(v)
                c, ln = ac_codes[(run << 4) | size]
                bw.write(c, ln)
                bw.write(bits, size)
                run = 0
            if last_nz < 63:
                c, ln = ac_codes[0x00]
                bw.write(c, ln)
    return pred


def _jpeg_planes(pixels, quality: int, subsample: bool, fn_name: str):
    """Shared encoder front half: validate, color-convert, scale the
    quant tables, pad to MCU geometry, 4:2:0-average chroma. One copy
    — the progressive encoder's pixel-identity pin depends on both
    encoders quantizing EXACTLY the same planes."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"{fn_name} wants (h, w[, 3])")
    h0, w0, _ = px.shape
    if h0 == 0 or w0 == 0:
        raise ValueError("empty image")
    ycc = _rgb_to_ycbcr(px)
    qy = _scaled_q(_QL, quality)
    qc = _scaled_q(_QC, quality)
    if subsample:  # 4:2:0
        sampy, sampc = (2, 2), (1, 1)
        y = _pad_to(ycc[..., 0], 16, 16)
        cbp = _pad_to(ycc[..., 1], 16, 16)
        crp = _pad_to(ycc[..., 2], 16, 16)
        cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        sampy, sampc = (1, 1), (1, 1)
        y = _pad_to(ycc[..., 0], 8, 8)
        cb = _pad_to(ycc[..., 1], 8, 8)
        cr = _pad_to(ycc[..., 2], 8, 8)
    return h0, w0, y, cb, cr, qy, qc, sampy, sampc


def _jpeg_head(h0, w0, sampy, sampc, qy, qc, sof_marker, ac_bits, ac_syms):
    """SOI + DQT + SOF + DHT — shared container head; only the SOF
    marker (C0/C2) and the AC Huffman table differ between the
    baseline and progressive encoders."""
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: two tables, zigzag order, 8-bit
    for tq, q in ((0, qy), (1, qc)):
        body = bytes([tq]) + bytes(int(q[ZIGZAG[k]]) for k in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    body = struct.pack(">BHHB", 8, h0, w0, 3)
    for cid, (sh, sv), tq in ((1, sampy, 0), (2, sampc, 1), (3, sampc, 1)):
        body += bytes([cid, (sh << 4) | sv, tq])
    out += sof_marker + struct.pack(">H", 2 + len(body)) + body
    # DHT: DC (class 0, id 0) and AC (class 1, id 0)
    for cls, bits, vals in ((0, _DC_BITS, _DC_SYMS), (1, ac_bits, ac_syms)):
        body = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    return out


def encode_jpeg(
    pixels: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    h0, w0, y, cb, cr, qy, qc, sampy, sampc = _jpeg_planes(
        pixels, quality, subsample, "encode_jpeg"
    )
    dc_codes = _canonical_codes(_DC_BITS, _DC_SYMS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_SYMS)
    out = _jpeg_head(h0, w0, sampy, sampc, qy, qc, b"\xff\xc0", _AC_BITS, _AC_SYMS)
    # SOS
    body = bytes([3])
    for cid in (1, 2, 3):
        body += bytes([cid, 0x00])  # DC/AC table 0
    body += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    bw = _BitWriter()
    if subsample:
        predy = predcb = predcr = 0
        n_mcu_y = y.shape[0] // 16
        n_mcu_x = y.shape[1] // 16
        for my in range(n_mcu_y):
            for mx in range(n_mcu_x):
                for dy in range(2):
                    for dx in range(2):
                        by, bx = my * 16 + dy * 8, mx * 16 + dx * 8
                        predy = _encode_blocks(
                            y[by : by + 8, bx : bx + 8], qy, bw, dc_codes, ac_codes, predy
                        )
                        # (single block; _encode_blocks iterates tiles)
                predcb = _encode_blocks(
                    cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], qc, bw, dc_codes, ac_codes, predcb
                )
                predcr = _encode_blocks(
                    cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], qc, bw, dc_codes, ac_codes, predcr
                )
    else:
        predy = predcb = predcr = 0
        nby = y.shape[0] // 8
        nbx = y.shape[1] // 8
        for by in range(nby):
            for bx in range(nbx):
                predy = _encode_blocks(
                    y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qy, bw, dc_codes, ac_codes, predy
                )
                predcb = _encode_blocks(
                    cb[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qc, bw, dc_codes, ac_codes, predcb
                )
                predcr = _encode_blocks(
                    cr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qc, bw, dc_codes, ac_codes, predcr
                )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- decoder ---------------------------------------------------------


@_malformed_raises_valueerror
def decode_jpeg(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from a baseline sequential (SOF0) OR
    progressive (SOF2) JPEG — see the section header for the full
    surface. Other frame types (lossless, arithmetic, hierarchical)
    raise ValueError."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    sof = None
    restart_interval = 0
    prog_state = None
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # ITU T.81 B.1.1.2: any number of 0xFF fill bytes may pad
        # before a marker — skip them (libjpeg emits these)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            break
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI — no segment body
            if prog_state is not None:
                return _prog_reconstruct(prog_state, sof, qt)
            raise ValueError("JPEG has no scan")
        if pos + 2 > len(payload):
            break
        (length,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + length]
        if len(body) != length - 2:
            raise ValueError("truncated JPEG segment")
        seg_end = pos + length
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.array(list(body[p : p + 64]), dtype=np.float64)
                    p += 64
                else:
                    tbl = np.array(
                        list(struct.unpack_from(f">{64}H", body, p)), dtype=np.float64
                    )
                    p += 128
                nat = np.empty(64)
                nat[ZIGZAG] = tbl  # stored zigzag -> natural
                qt[tq] = nat
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0x0F
                p += 1
                bits = list(body[p : p + 16])
                p += 16
                n = sum(bits)
                vals = list(body[p : p + n])
                p += n
                (huff_dc if cls == 0 else huff_ac)[tid] = _HuffDecoder(bits, vals)
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, hh, ww, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            sof = {"h": hh, "w": ww, "comps": comps,
                   "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0) / progressive (SOF2) JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            sel = {}
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                sel[cid] = (tt >> 4, tt & 0x0F)
            if not sof["progressive"]:
                return _decode_scan(
                    payload, seg_end, sof, sel, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            if 4 + 2 * ns > len(body):
                raise ValueError("truncated progressive SOS header")
            ss, se, ahl = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            if prog_state is None:
                prog_state = _prog_init(sof)
            data, rsts, end = _strip_entropy(payload, seg_end)
            _decode_prog_scan(
                prog_state, sof, sel, list(sel), ss, se, ahl >> 4, ahl & 0x0F,
                huff_dc, huff_ac, data, rsts, restart_interval,
            )
            pos = end
            continue
        pos = seg_end
    if prog_state is not None:
        # scans present but the EOI marker was cut off — the image is
        # complete once every scan has run; reconstruct what we have
        return _prog_reconstruct(prog_state, sof, qt)
    raise ValueError("JPEG has no scan")


def _decode_scan(payload, pos, sof, sel, qt, huff_dc, huff_ac, dri):
    comps = sof["comps"]
    h0, w0 = sof["h"], sof["w"]
    if h0 == 0 or w0 == 0:
        raise ValueError("bad dimensions")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0 or hmax > 4 or vmax > 4:
        raise ValueError("bad sampling factors")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w0 // mcu_w)
    mcus_y = -(-h0 // mcu_h)
    planes = {}
    for c in comps:
        pw = mcus_x * 8 * c["h"]
        ph = mcus_y * 8 * c["v"]
        planes[c["id"]] = np.zeros((ph, pw))
    data, rst_positions, _ = _strip_entropy(payload, pos)
    br = _BitReader(data)
    preds = {c["id"]: 0 for c in comps}
    rst_i = 0
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and n_mcu and n_mcu % dri == 0:
                # restart: align + reset predictions; the marker byte
                # positions were stripped, so just realign
                br.align()
                # skip to the recorded boundary if we're behind it
                if rst_i < len(rst_positions):
                    br.pos = max(br.pos, rst_positions[rst_i])
                    rst_i += 1
                preds = {c["id"]: 0 for c in comps}
            n_mcu += 1
            for c in comps:
                dct, act = sel[c["id"]]
                hd, ha = huff_dc.get(dct), huff_ac.get(act)
                q = qt.get(c["tq"])
                if hd is None or ha is None or q is None:
                    raise ValueError("missing JPEG table")
                for dy in range(c["v"]):
                    for dx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = hd.decode(br)
                        if size > 11:
                            raise ValueError("bad DC size")
                        diff = _extend(br.read_bits(size), size) if size else 0
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k <= 63:
                            sym = ha.decode(br)
                            if sym == 0x00:
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        coef = np.zeros(64)
                        coef[ZIGZAG] = zz  # zigzag -> natural
                        block = idct(coef.reshape(8, 8) * q.reshape(8, 8)) + 128.0
                        by = (my * c["v"] + dy) * 8
                        bx = (mx * c["h"] + dx) * 8
                        planes[c["id"]][by : by + 8, bx : bx + 8] = block
    # upsample to full res (replication) and convert
    full = []
    for c in comps:
        pl = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            pl = np.repeat(np.repeat(pl, ry, axis=0), rx, axis=1)
        full.append(pl[:h0, :w0])
    if len(full) == 3:
        return _ycbcr_to_rgb(full[0], full[1], full[2])
    if len(full) == 1:
        g = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    raise ValueError(f"unsupported component count {len(full)}")


# ---- progressive (SOF2) ----------------------------------------------
# Multi-scan coefficient accumulation per ITU T.81 §G: each SOS carries
# (Ss, Se, Ah, Al); DC scans may be interleaved, AC scans are always
# single-component over the component's own (unpadded) block raster.
# Successive approximation is exact — the final coefficient arrays
# equal what one baseline scan would carry, so decode output is
# pixel-identical to the equivalent baseline file.


def _strip_entropy(payload: bytes, pos: int) -> tuple[bytes, list[int], int]:
    """Entropy bytes from ``pos`` to the next non-RST marker:
    (unstuffed data, RST boundary offsets into it, end position)."""
    data = bytearray()
    rst_positions = []
    p = pos
    while p < len(payload) - 1:
        b = payload[p]
        if b == 0xFF:
            nxt = payload[p + 1]
            if nxt == 0x00:
                data.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                rst_positions.append(len(data))
                p += 2
                continue
            break  # EOI or other marker
        data.append(b)
        p += 1
    return bytes(data), rst_positions, p


def _prog_init(sof):
    comps = sof["comps"]
    h0, w0 = sof["h"], sof["w"]
    if h0 == 0 or w0 == 0:
        raise ValueError("bad dimensions")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0 or hmax > 4 or vmax > 4:
        raise ValueError("bad sampling factors")
    mcus_x = -(-w0 // (8 * hmax))
    mcus_y = -(-h0 // (8 * vmax))
    geo = {}
    coefs = {}
    for c in comps:
        if c["h"] == 0 or c["v"] == 0:
            raise ValueError("bad sampling factors")
        cw = -(-(w0 * c["h"]) // hmax)
        ch = -(-(h0 * c["v"]) // vmax)
        geo[c["id"]] = {
            "nbx": -(-cw // 8),  # true (non-interleaved) block counts
            "nby": -(-ch // 8),
        }
        coefs[c["id"]] = np.zeros(
            (mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int64
        )
    return {"geom": (mcus_x, mcus_y, hmax, vmax, geo), "coefs": coefs}


def _prog_ac_first(br, ha, blk, ss, se, al, ctx):
    if ctx["eobrun"] > 0:
        ctx["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        sym = ha.decode(br)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            ctx["eobrun"] = eobrun
            break
        k += r
        if k > se:
            raise ValueError("AC run past spectral end")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1


def _prog_ac_refine(br, ha, blk, ss, se, al, ctx):
    p1 = 1 << al
    k = ss
    if ctx["eobrun"] == 0:
        while k <= se:
            sym = ha.decode(br)
            r, s = sym >> 4, sym & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    ctx["eobrun"] = eobrun
                    break
                # r == 15: skip 16 zero-history coefficients below
            else:
                if s != 1:
                    raise ValueError("bad AC refine symbol")
                newval = p1 if br.read_bit() else -p1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    # correction bit for an already-nonzero coefficient
                    if br.read_bit() and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[k] = newval
            k += 1
    if ctx["eobrun"] > 0:
        while k <= se:
            v = int(blk[k])
            if v != 0 and br.read_bit() and (v & p1) == 0:
                blk[k] = v + (p1 if v >= 0 else -p1)
            k += 1
        ctx["eobrun"] -= 1


def _decode_prog_scan(
    state, sof, sel, ids, ss, se, ah, al, huff_dc, huff_ac, data, rsts, dri
):
    mcus_x, mcus_y, hmax, vmax, geo = state["geom"]
    coefs = state["coefs"]
    for cid in ids:
        if cid not in coefs:
            raise ValueError("scan references unknown component")
    if ah > 13 or al > 13:
        raise ValueError("bad successive-approximation bits")
    br = _BitReader(data)
    ctx = {"eobrun": 0, "preds": {cid: 0 for cid in ids}, "rst_i": 0}

    def restart_boundary():
        br.align()
        # DRI promised a marker here; running out, or the entropy
        # decoder having consumed PAST the recorded marker offset,
        # means the stream is corrupt — refuse instead of silently
        # resyncing to wrong pixels (r10 ADVICE)
        if ctx["rst_i"] >= len(rsts):
            raise ValueError("missing JPEG restart marker")
        if br.pos > rsts[ctx["rst_i"]]:
            raise ValueError("JPEG entropy data overran restart boundary")
        br.pos = rsts[ctx["rst_i"]]
        ctx["rst_i"] += 1
        ctx["preds"] = {cid: 0 for cid in ids}
        ctx["eobrun"] = 0

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("bad progressive DC scan")
        comps_by_id = {c["id"]: c for c in sof["comps"]}

        def dc_unit(cid, by, bx):
            arr = coefs[cid]
            if ah == 0:
                hd = huff_dc.get(sel[cid][0])
                if hd is None:
                    raise ValueError("missing JPEG table")
                size = hd.decode(br)
                if size > 11:
                    raise ValueError("bad DC size")
                diff = _extend(br.read_bits(size), size) if size else 0
                ctx["preds"][cid] += diff
                arr[by, bx, 0] = ctx["preds"][cid] << al
            elif br.read_bit():
                arr[by, bx, 0] |= 1 << al

        n_mcu = 0
        if len(ids) > 1:  # interleaved: MCU order over padded blocks
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if dri and n_mcu and n_mcu % dri == 0:
                        restart_boundary()
                    n_mcu += 1
                    for cid in ids:
                        c = comps_by_id[cid]
                        for dy in range(c["v"]):
                            for dx in range(c["h"]):
                                dc_unit(cid, my * c["v"] + dy, mx * c["h"] + dx)
        else:  # non-interleaved: the component's true raster
            cid = ids[0]
            g = geo[cid]
            for by in range(g["nby"]):
                for bx in range(g["nbx"]):
                    if dri and n_mcu and n_mcu % dri == 0:
                        restart_boundary()
                    n_mcu += 1
                    dc_unit(cid, by, bx)
        return

    # AC scan: always single-component, true raster
    if len(ids) != 1 or se > 63 or ss > se:
        raise ValueError("bad progressive AC scan")
    cid = ids[0]
    ha = huff_ac.get(sel[cid][1])
    if ha is None:
        raise ValueError("missing JPEG table")
    g = geo[cid]
    arr = coefs[cid]
    n_mcu = 0
    for by in range(g["nby"]):
        for bx in range(g["nbx"]):
            if dri and n_mcu and n_mcu % dri == 0:
                restart_boundary()
            n_mcu += 1
            blk = arr[by, bx]
            if ah == 0:
                _prog_ac_first(br, ha, blk, ss, se, al, ctx)
            else:
                _prog_ac_refine(br, ha, blk, ss, se, al, ctx)


def _prog_reconstruct(state, sof, qt):
    comps = sof["comps"]
    h0, w0 = sof["h"], sof["w"]
    _, _, hmax, vmax, _ = state["geom"]
    full = []
    for c in comps:
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError("missing JPEG table")
        arr = state["coefs"][c["id"]]
        nby, nbx, _ = arr.shape
        plane = np.zeros((nby * 8, nbx * 8))
        qv = q.reshape(8, 8)
        for by in range(nby):
            for bx in range(nbx):
                coef = np.zeros(64)
                coef[ZIGZAG] = arr[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    idct(coef.reshape(8, 8) * qv) + 128.0
                )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h0, :w0])
    if len(full) == 3:
        return _ycbcr_to_rgb(full[0], full[1], full[2])
    if len(full) == 1:
        g = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    raise ValueError(f"unsupported component count {len(full)}")


# ---- progressive encoder ---------------------------------------------
# 8-scan successive-approximation script (the shape cjpeg's default
# progressive script uses, reduced to one approximation level):
#   1. DC first, interleaved, Al=1
#   2-4. AC first per component, Ss=1..63, Al=1 (EOB-run coded)
#   5. DC refine, interleaved, Ah=1 -> Al=0 (raw bits, no Huffman)
#   6-8. AC refine per component, Ah=1 -> Al=0 (correction bits)
# Every decoder scan path above is exercised, and the reconstruction
# is exact, so decode(progressive) == decode(baseline) pixel-for-pixel
# at the same quality/subsampling.


def _flush_eobrun(bw, ac_codes, st):
    if st["eobrun"] > 0:
        nbits = st["eobrun"].bit_length() - 1
        c, ln = ac_codes[nbits << 4]
        bw.write(c, ln)
        if nbits:
            bw.write(st["eobrun"] & ((1 << nbits) - 1), nbits)
        st["eobrun"] = 0
        for b in st["pending"]:
            bw.write(b, 1)
        st["pending"] = []


def _enc_ac_first(bw, ac_codes, blk, ss, se, al, st):
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        while r > 15:
            _flush_eobrun(bw, ac_codes, st)
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            r -= 16
        _flush_eobrun(bw, ac_codes, st)
        size, bits = _mag_bits(t if v >= 0 else -t)
        if size > 10:
            raise ValueError("AC coefficient too large")
        c, ln = ac_codes[(r << 4) | size]
        bw.write(c, ln)
        bw.write(bits, size)
        r = 0
    if r > 0:
        st["eobrun"] += 1
        if st["eobrun"] == 0x7FFF:
            _flush_eobrun(bw, ac_codes, st)


def _enc_ac_refine(bw, ac_codes, blk, ss, se, al, st):
    absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1  # position of the last NEWLY-significant coefficient
    for i, t in enumerate(absv):
        if t == 1:
            eob = ss + i
    r = 0
    br_bits: list[int] = []
    for i, t in enumerate(absv):
        k = ss + i
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _flush_eobrun(bw, ac_codes, st)
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            r -= 16
            for b in br_bits:
                bw.write(b, 1)
            br_bits = []
        if t > 1:  # nonzero history: queue the correction bit
            br_bits.append(t & 1)
            continue
        _flush_eobrun(bw, ac_codes, st)
        c, ln = ac_codes[(r << 4) | 1]
        bw.write(c, ln)
        bw.write(1 if int(blk[k]) >= 0 else 0, 1)
        for b in br_bits:
            bw.write(b, 1)
        br_bits = []
        r = 0
    if r > 0 or br_bits:
        st["eobrun"] += 1
        st["pending"].extend(br_bits)
        if st["eobrun"] == 0x7FFF:
            _flush_eobrun(bw, ac_codes, st)


def _quant_zigzag_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    nby, nbx = h // 8, w // 8
    out = np.zeros((nby, nbx, 64), dtype=np.int64)
    qv = q.reshape(8, 8)
    for by in range(nby):
        for bx in range(nbx):
            block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = np.round(fdct(block) / qv).astype(np.int64)
            out[by, bx] = coef.reshape(-1)[ZIGZAG]
    return out


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """``restart_interval`` > 0 emits a DRI segment and RST markers
    every N MCUs (N blocks in the non-interleaved AC scans) in every
    scan — resetting DC predictions and flushing/closing EOB runs at
    each boundary — primarily so the decoder's per-scan restart
    machinery is pinned by a real in-repo stream."""
    h0, w0, y, cb, cr, qy, qc, sampy, sampc = _jpeg_planes(
        pixels, quality, subsample, "encode_jpeg_progressive"
    )
    blocks = {
        1: _quant_zigzag_blocks(y, qy),
        2: _quant_zigzag_blocks(cb, qc),
        3: _quant_zigzag_blocks(cr, qc),
    }
    samp = {1: sampy, 2: sampc, 3: sampc}
    hmax, vmax = sampy
    mcus_y = blocks[1].shape[0] // vmax
    mcus_x = blocks[1].shape[1] // hmax
    nb_ni = {}
    for cid, (sh, sv) in samp.items():
        cw = -(-(w0 * sh) // hmax)
        ch = -(-(h0 * sv) // vmax)
        nb_ni[cid] = (-(-ch // 8), -(-cw // 8))

    dc_codes = _canonical_codes(_DC_BITS, _DC_SYMS)
    ac_codes = _canonical_codes(_AC_BITS_PROG, _AC_SYMS_PROG)
    out = _jpeg_head(
        h0, w0, sampy, sampc, qy, qc, b"\xff\xc2", _AC_BITS_PROG, _AC_SYMS_PROG
    )

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def sos(ids, ss, se, ah, al):
        body = bytes([len(ids)])
        for cid in ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    def mcus():
        """Per-MCU unit lists (cid, by, bx) in interleaved order."""
        for my in range(mcus_y):
            for mx in range(mcus_x):
                yield [
                    (cid, my * samp[cid][1] + dy, mx * samp[cid][0] + dx)
                    for cid in (1, 2, 3)
                    for dy in range(samp[cid][1])
                    for dx in range(samp[cid][0])
                ]

    # scan 1: DC first (interleaved, Al=1)
    bw = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    for n, units in enumerate(mcus()):
        if restart_interval and n and n % restart_interval == 0:
            bw.restart(n // restart_interval - 1)
            preds = {1: 0, 2: 0, 3: 0}
        for cid, by, bx in units:
            t = int(blocks[cid][by, bx, 0]) >> 1
            size, bits = _mag_bits(t - preds[cid])
            preds[cid] = t
            c, ln = dc_codes[size]
            bw.write(c, ln)
            if size:
                bw.write(bits, size)
    out += sos((1, 2, 3), 0, 0, 0, 1) + bw.flush()

    def ac_scan(cid, ah, al, enc):
        bw = _BitWriter()
        st = {"eobrun": 0, "pending": []}
        nby, nbx = nb_ni[cid]
        n = 0
        for by in range(nby):
            for bx in range(nbx):
                # a non-interleaved scan's restart unit is one block;
                # the pending EOB run must close BEFORE the marker
                if restart_interval and n and n % restart_interval == 0:
                    _flush_eobrun(bw, ac_codes, st)
                    bw.restart(n // restart_interval - 1)
                n += 1
                enc(bw, ac_codes, blocks[cid][by, bx], 1, 63, al, st)
        _flush_eobrun(bw, ac_codes, st)
        out_ = sos((cid,), 1, 63, ah, al) + bw.flush()
        return out_

    # scans 2-4: AC first per component (Al=1)
    for cid in (1, 2, 3):
        out += ac_scan(cid, 0, 1, _enc_ac_first)

    # scan 5: DC refine (interleaved, raw bits)
    bw = _BitWriter()
    for n, units in enumerate(mcus()):
        if restart_interval and n and n % restart_interval == 0:
            bw.restart(n // restart_interval - 1)
        for cid, by, bx in units:
            bw.write(int(blocks[cid][by, bx, 0]) & 1, 1)
    out += sos((1, 2, 3), 0, 0, 1, 0) + bw.flush()

    # scans 6-8: AC refine per component (Ah=1 -> Al=0)
    for cid in (1, 2, 3):
        out += ac_scan(cid, 1, 0, _enc_ac_refine)

    out += b"\xff\xd9"  # EOI
    return bytes(out)


