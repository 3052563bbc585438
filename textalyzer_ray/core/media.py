"""Pure-stdlib/numpy media decoding for container-less formats.

The sandbox has no image/video codec libraries (PIL, opencv, ffmpeg),
but several production-relevant raw formats need none:

- ``decode_ppm``: PPM (P6) / PGM (P5) binary netpbm — header + raw
  pixels.
- ``decode_bmp``: uncompressed 24/32-bit BMP (BITMAPINFOHEADER,
  BI_RGB) — bottom-up padded BGR rows.
- ``decode_wav``: PCM WAV via the stdlib ``wave`` module.
- ``resize_nearest``: nearest-neighbor resize (pure numpy indexing).

These make the multimodal stages REAL for raw payloads; compressed
formats (JPEG/PNG/MP4) still raise ``UnsupportedMediaError`` and are the
documented stub boundary (stages/multimodal.py).
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
