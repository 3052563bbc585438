"""Pure-stdlib/numpy media decoding for container-less formats.

The sandbox has no image/video codec libraries (PIL, opencv, ffmpeg),
but several production-relevant raw formats need none:

- ``decode_ppm``: PPM (P6) / PGM (P5) binary netpbm — header + raw
  pixels.
- ``decode_bmp``: uncompressed 24/32-bit BMP (BITMAPINFOHEADER,
  BI_RGB) — bottom-up padded BGR rows.
- ``decode_wav``: PCM WAV via the stdlib ``wave`` module.
- ``decode_png`` / ``encode_png``: 8-bit non-interlaced PNG — a REAL
  compressed format whose only codec is stdlib zlib plus the five
  per-row byte filters (r3).
- ``decode_y4m`` / ``encode_y4m_mono``: YUV4MPEG2 uncompressed video
  (the mjpegtools container) — luma-plane frames for Cmono and 4:2:0
  streams (r3).
- ``resize_nearest``: nearest-neighbor resize (pure numpy indexing).

These make the multimodal stages REAL for raw payloads, PNG and y4m
video; formats needing actual codec libraries (JPEG/MP4) still raise
``UnsupportedMediaError`` and are the documented stub boundary
(stages/multimodal.py).
"""

from __future__ import annotations

import io
import wave

import numpy as np


class UnsupportedMediaError(ValueError):
    """Raised for formats that need codec libraries absent here."""


def _ppm_tokens(buf: bytes, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated integer tokens after the magic,
    skipping ``#`` comments; returns (values, offset_past_header)."""
    vals: list[int] = []
    i = 2  # past magic
    while len(vals) < n:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if i < len(buf) and buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise UnsupportedMediaError("truncated netpbm header")
        vals.append(int(buf[i:j]))
        i = j
    return vals, i + 1  # single whitespace after maxval


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 -> (h, w, 3) uint8; P5 -> (h, w) uint8."""
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise UnsupportedMediaError(f"not a binary netpbm file: {magic!r}")
    (w, h, maxval), off = _ppm_tokens(data, 3)
    if maxval > 255:
        raise UnsupportedMediaError("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    if len(data) - off < need:
        raise UnsupportedMediaError("truncated netpbm payload")
    px = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    return px.reshape((h, w, 3)) if ch == 3 else px.reshape((h, w))


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP file")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if comp != 0 or bpp not in (24, 32):
        raise UnsupportedMediaError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, comp={comp})"
        )
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    if len(data) - off < stride * h:
        raise UnsupportedMediaError("truncated BMP payload")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=off
    ).reshape((h, stride))[:, : w * bytes_pp].reshape((h, w, bytes_pp))
    if flip:
        rows = rows[::-1]
    # BGR(A) -> RGB
    return np.ascontiguousarray(rows[:, :, 2::-1])


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per color type: 0 gray, 2 RGB, 3 palette index, 4 gray+A, 6 RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG -> uint8 array (h, w) gray or
    (h, w, ch) — a REAL compressed-format decoder with zero codec
    libraries: PNG's only codec is zlib (stdlib) plus five per-row
    byte filters (spec §6), unfiltered here with numpy (sub is a
    modular prefix-sum per byte lane; up is vectorized; average/paeth
    walk bytes). Palette (PLTE) images come back expanded to RGB.
    16-bit and interlaced files raise ``UnsupportedMediaError``."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise UnsupportedMediaError("not a PNG file")
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            raise UnsupportedMediaError("truncated PNG chunk")
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"PLTE":
            plte = body
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + data + crc
    if ihdr is None or not idat:
        raise UnsupportedMediaError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, _comp, _filt, interlace = ihdr[8:13]
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise UnsupportedMediaError(
            f"only 8-bit non-interlaced PNG supported "
            f"(depth={depth}, color={ctype}, interlace={interlace})"
        )
    ch = _PNG_CHANNELS[ctype]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise UnsupportedMediaError(f"corrupt PNG stream: {e}") from e
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise UnsupportedMediaError("truncated PNG pixel data")
    rows = np.frombuffer(raw, np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    filters, scan = rows[:, 0], rows[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f, row = int(filters[y]), scan[y]
        if f == 0:
            cur = row.copy()
        elif f == 1:  # sub: modular prefix-sum per byte lane
            cur = row.reshape(-1, ch).cumsum(axis=0).reshape(-1) % 256
        elif f == 2:  # up
            cur = (row + prev) % 256
        elif f == 3:  # average
            cur = row.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                cur[x] = (cur[x] + (a + prev[x]) // 2) % 256
        elif f == 4:  # paeth
            cur = row.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) % 256
        else:
            raise UnsupportedMediaError(f"unknown PNG filter {f}")
        out[y] = cur
        prev = cur
    img = out.astype(np.uint8).reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise UnsupportedMediaError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        img = pal[img[:, :, 0]]
    return img[:, :, 0] if img.shape[2] == 1 else img


def encode_png(img: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Minimal PNG encoder (fixture generation — the container has no
    image libraries to make test files with). 8-bit gray/RGB/RGBA;
    ``filters`` picks the per-row filter type (default: cycle 0-4 so a
    round-trip exercises every decode path)."""
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int64)
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = filters[y % len(filters)] if filters else (y % 5)
        cur = flat[y]
        if f == 0:
            enc = cur % 256
        elif f == 1:
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            enc = (cur - left) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            enc = (cur - (left + prev) // 2) % 256
        else:  # paeth
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            ul = np.concatenate([np.zeros(ch, np.int64), prev[:-ch]])
            p = left + prev - ul
            pa_, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = (cur - pred) % 256
        lines.append(f)
        lines.extend(enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(typ + body) & 0xFFFFFFFF
        return len(body).to_bytes(4, "big") + typ + body + crc.to_bytes(4, "big")

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, ctype, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (samples float64 in [-1, 1], shape (n,) mono-mixed,
    sample_rate)."""
    try:
        with wave.open(io.BytesIO(data)) as f:
            n = f.getnframes()
            rate = f.getframerate()
            width = f.getsampwidth()
            nch = f.getnchannels()
            raw = f.readframes(n)
    except (wave.Error, EOFError) as e:
        raise UnsupportedMediaError(f"not a PCM WAV file: {e}") from e
    if width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise UnsupportedMediaError(f"unsupported sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def decode_y4m(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """YUV4MPEG2 (.y4m) uncompressed video -> (frames, fps) with
    ``frames`` a (n, h, w) uint8 array of the LUMA plane and ``fps`` the
    (num, den) rate. Supports Cmono (Y only) and C420/C420jpeg/C420paldv
    (chroma planes parsed and skipped); other colourspaces raise.

    Y4M is a real public container (mjpegtools spec): one ASCII stream
    header ``YUV4MPEG2 W.. H.. F..:.. [Ip] [A..] [C..]\\n``, then per
    frame a ``FRAME[ params]\\n`` marker followed by raw planes."""
    if not data.startswith(b"YUV4MPEG2"):
        raise UnsupportedMediaError("not a YUV4MPEG2 stream")
    nl = data.find(b"\n")
    if nl < 0:
        raise UnsupportedMediaError("missing y4m stream header terminator")
    w = h = 0
    fps = (25, 1)
    cspace = b"420"  # spec default when no C tag
    try:
        for tok in data[10:nl].split(b" "):
            if not tok:
                continue
            tag, val = tok[:1], tok[1:]
            if tag == b"W":
                w = int(val)
            elif tag == b"H":
                h = int(val)
            elif tag == b"F":
                num, den = val.split(b":", 1)
                fps = (int(num), int(den))
            elif tag == b"C":
                cspace = val
    except ValueError as e:
        # crawl-garbage header params keep the module's documented
        # error contract (the ADVICE r2 media-error rule)
        raise UnsupportedMediaError(f"malformed y4m header: {e}") from e
    if w <= 0 or h <= 0:
        raise UnsupportedMediaError("y4m header missing W/H")
    if cspace == b"mono":
        frame_bytes = w * h
    elif cspace in (b"420", b"420jpeg", b"420paldv", b"420mpeg2"):
        if w % 2 or h % 2:
            raise UnsupportedMediaError("odd dimensions for 4:2:0 chroma")
        frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    else:
        raise UnsupportedMediaError(
            f"unsupported y4m colourspace C{cspace.decode(errors='replace')}"
        )
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos : pos + 5] == b"FRAME":
            raise UnsupportedMediaError("malformed y4m FRAME marker")
        pos = fnl + 1
        if len(data) - pos < frame_bytes:
            raise UnsupportedMediaError("truncated y4m frame payload")
        frames.append(
            np.frombuffer(data, np.uint8, count=w * h, offset=pos).reshape(
                h, w
            )
        )
        pos += frame_bytes
    if not frames:
        raise UnsupportedMediaError("y4m stream has no frames")
    return np.stack(frames), fps


def encode_y4m_mono(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n, h, w) uint8 luma frames -> Cmono YUV4MPEG2 bytes (the
    deterministic test-fixture writer; real files from mjpegtools/ffmpeg
    parse with the same decoder)."""
    n, h, w = frames.shape
    parts = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 Cmono\n" % (w, h, *fps)]
    for i in range(n):
        parts.append(b"FRAME\n")
        parts.append(frames[i].tobytes())
    return b"".join(parts)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via index maps (no interpolation libs)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[ys][:, xs]


def image_features(img: np.ndarray) -> tuple[int, int, float]:
    """(width, height, mean pixel in [0,1]) for a decoded array."""
    h, w = img.shape[:2]
    return w, h, float(img.mean() / 255.0)


def audio_features(samples: np.ndarray, rate: int, bins: int = 8) -> np.ndarray:
    """Deterministic fixed-size features: normalized ``bins``-bin
    magnitude spectrum (rfft) — float32[bins]."""
    if len(samples) == 0:
        return np.zeros(bins, dtype=np.float32)
    mag = np.abs(np.fft.rfft(samples))
    if len(mag) < bins:
        mag = np.pad(mag, (0, bins - len(mag)))
    chunks = np.array_split(mag, bins)
    feat = np.array([c.sum() for c in chunks], dtype=np.float64)
    total = feat.sum()
    if total > 0:
        feat = feat / total
    return feat.astype(np.float32)
