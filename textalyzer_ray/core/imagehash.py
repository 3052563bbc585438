"""Perceptual image hashing (dHash) — exact, engine-independent
semantics for image-level deduplication.

dHash (difference hash, public technique popularized by the
kind-of-like-that blog and pHash literature): reduce the image to a
small grayscale grid of block means and record, per row, whether each
cell is brighter than its left neighbor — a 64-bit gradient signature
robust to re-encoding and scaling. Identical hashes = duplicate images
(the exact-dedup application); small hamming distances = near-dups
(the simhash chunk-table machinery applies unchanged).

Exactness contract (the CLAUDE.md hard-oracle rule):

- input grid is 16 x 18 grayscale (the canonical 8 x 9 mean grid from
  2 x 2 integer block SUMS — comparing sums is equivalent to comparing
  means and stays in integers);
- bit (Y, X) for Y in 0..7, X in 0..7 is ``sum(Y, X+1) > sum(Y, X)``,
  packed at index i = Y*8 + X;
- the 64-bit hash ships as two BIGINT halves (lo = bits 0..31,
  hi = bits 32..63), each < 2^32 — no unsigned headaches in Arrow,
  polars or DuckDB.

Every step is integer arithmetic a SQL oracle replays verbatim.
Real-world images reach this grid through a real decode + block-mean
resize (stages/multimodal.py DecodeImage / core.media); the driver
query synthesizes 16 x 18 PGMs directly from doc_id arithmetic so the
REAL netpbm decoder sits in the gated path.
"""

from __future__ import annotations

import numpy as np

from textalyzer_ray.core.media import decode_ppm

DHASH_W = 18
DHASH_H = 16


def synth_gray_pgm(k: int, w: int = DHASH_W, h: int = DHASH_H) -> bytes:
    """Deterministic P5 test image for class ``k``: pixel(y, x) =
    (k*7 + x*13 + y*31 + (x*y*(k+3)) % 97) % 256 — pure integer
    arithmetic a SQL oracle re-derives; the xy cross term gives every
    class a distinct gradient structure (measured: 40/40 distinct
    dhashes for k in 0..39)."""
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    xx, yy = np.meshgrid(x, y)
    px = ((k * 7 + xx * 13 + yy * 31 + (xx * yy * (k + 3)) % 97) % 256).astype(
        np.uint8
    )
    return b"P5 %d %d 255\n" % (w, h) + px.tobytes()


def dhash64(gray: np.ndarray) -> int:
    """(16, 18) uint8 grayscale -> 64-bit dHash as a Python int."""
    if gray.shape != (DHASH_H, DHASH_W):
        raise ValueError(f"dhash64 expects {(DHASH_H, DHASH_W)}, got {gray.shape}")
    s = gray.astype(np.int64).reshape(8, 2, 9, 2).sum(axis=(1, 3))  # (8, 9)
    bits = (s[:, 1:] > s[:, :-1]).astype(np.uint64)  # (8, 8) [Y, X]
    idx = (np.arange(8)[:, None] * 8 + np.arange(8)[None, :]).astype(np.uint64)
    return int((bits << idx).sum())


def dhash_hi_lo(h: int) -> tuple[int, int]:
    """Split into (hi, lo) BIGINT-safe halves (each < 2^32)."""
    return h >> 32, h & 0xFFFFFFFF


def dhash_of_pgm(data: bytes) -> tuple[int, int]:
    """Scalar reference: decode (REAL netpbm parser) + hash ->
    (hi, lo). The vectorized stage must match bit-for-bit."""
    return dhash_hi_lo(dhash64(decode_ppm(data)))


# ---- video (frame sequence) ----

VHASH_FOLD_B = 1_000_003  # the repo's polyhash base; d*B < 2^84 << 2^127
_MAXU64 = (1 << 64) - 1


def synth_video_frame(
    k: int, f: int, w: int = DHASH_W, h: int = DHASH_H
) -> np.ndarray:
    """Frame ``f`` of class ``k``: pixel(y, x) = (k*7 + f*11 + x*13 +
    y*31 + (x*y*(k+3+f)) % 97) % 256 — the image formula plus
    frame-dependent terms; SQL-replayable."""
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    xx, yy = np.meshgrid(x, y)
    return (
        (k * 7 + f * 11 + xx * 13 + yy * 31 + (xx * yy * (k + 3 + f)) % 97)
        % 256
    ).astype(np.uint8)


def synth_gray_y4m(k: int, n_frames: int = 8) -> bytes:
    """Deterministic Cmono YUV4MPEG2 clip for class ``k`` (measured:
    40/40 distinct folded vhashes for k in 0..39)."""
    from textalyzer_ray.core.media import encode_y4m_mono

    return encode_y4m_mono(
        np.stack([synth_video_frame(k, f) for f in range(n_frames)])
    )


def video_vhash64(frames: np.ndarray, n_sample: int = 4) -> int:
    """(n, 16, 18) luma frames -> 64-bit video signature: dHash each of
    ``n_sample`` evenly-spaced frames (source index floor(i*n/n_sample),
    the SampleFrames rule) and fold with the polyhash recurrence
    h = h*B + dhash mod 2^64 — order-sensitive, integer-exact."""
    total = frames.shape[0]
    h = 0
    for i in range(n_sample):
        p = min(i * total // n_sample, total - 1)
        h = (h * VHASH_FOLD_B + dhash64(frames[p])) & _MAXU64
    return h


def vhash_of_y4m(data: bytes, n_sample: int = 4) -> tuple[int, int]:
    """Scalar reference: REAL y4m decode + sampled-frame fold ->
    (hi, lo) BIGINT-safe halves."""
    from textalyzer_ray.core.media import decode_y4m

    frames, _fps = decode_y4m(data)
    return dhash_hi_lo(video_vhash64(frames, n_sample=n_sample))
