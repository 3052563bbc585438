"""Bloom-filter membership — exact, engine-independent semantics.

The crawl-scale "have I seen this URL before?" primitive: a fixed-size
bit array that answers maybe-seen/definitely-new without storing keys.
At 10^10 seen URLs and 8 bits/key the filter is ~10 GB — it broadcasts
once per node (``ray.put``) where the exact seen-set would be TBs, and
probing is pure vectorized bit math. False positives are the documented
trade (rate ~ (1 - e^{-k n/m})^k); false negatives are impossible.

Everything here is SQL-recomputable so a DuckDB oracle can replay the
filter bit-for-bit (the CLAUDE.md hard-oracle rule):

- per-key hash = :func:`textalyzer_ray.core.fingerprint.hll_hash64`
  (polyhash64 + fmix64, both already expressed in SQL by the
  approx_distinct_words oracle);
- the k probe positions use Kirsch–Mitzenmacher double hashing
  (h1 + i*h2 mod m) instead of k independent hashes — public result:
  two hashes preserve the asymptotic FP rate, and it keeps the SQL
  side to ONE hash chain plus integer multiply-adds:
  h1 = h mod 2^32 (the lo half), h2 = (h >> 32) | 1 (the hi half made
  odd so it is invertible mod the power-of-two m).

All intermediates stay far below 2^63: h1 < 2^32, i*h2 < k*2^32, so
(h1 + i*h2) is plain BIGINT arithmetic in the oracle.
"""

from __future__ import annotations

import numpy as np

from textalyzer_ray.core.fingerprint import hll_hash64, hll_hash64_array

_U32 = np.uint64(0xFFFFFFFF)


def bloom_positions(key: str | bytes, m_bits: int, k: int) -> list[int]:
    """The k bit positions of one key (scalar reference; the vectorized
    twin must match bit-for-bit, pinned by tests)."""
    h = hll_hash64(key)
    h1 = h & 0xFFFFFFFF
    h2 = (h >> 32) | 1
    return [(h1 + i * h2) % m_bits for i in range(k)]


def bloom_positions_array(keys: list[str], m_bits: int, k: int) -> np.ndarray:
    """Vectorized positions: shape (len(keys), k) int64."""
    if not keys:
        return np.zeros((0, k), dtype=np.int64)
    h = hll_hash64_array(keys)
    h1 = h & _U32
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def bloom_build(keys: list[str], m_bits: int, k: int) -> np.ndarray:
    """Scalar-reference filter build -> uint8 bitmap of m_bits/8 bytes.
    Bit b lives at byte b >> 3, mask 1 << (b & 7) (LSB-first)."""
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    if keys:
        pos = bloom_positions_array(keys, m_bits, k).ravel()
        np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bitmap


def bloom_maybe_contains(
    bitmap: np.ndarray, keys: list[str], k: int
) -> np.ndarray:
    """Vectorized probe -> bool array (True = maybe seen; all k bits
    set). m_bits is implied by the bitmap length."""
    if not keys:
        return np.zeros(0, dtype=bool)
    m_bits = int(bitmap.shape[0]) * 8
    pos = bloom_positions_array(keys, m_bits, k)
    bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)
