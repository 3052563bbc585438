"""Byte-level exact-substring duplication kernels (ExactSubstr — Lee,
Ippolito, Nystrom, Zhang, Eck, Callison-Burch, Carlini, "Deduplicating
Training Data Makes Language Models Better", ACL 2022).

Two pieces:

- ``window_hashes``: the distributed pipeline's vectorized rolling
  64-bit window hash over a concatenated byte buffer — one cumsum +
  two cumprods per block, O(bytes), no per-position Python. The
  multiplier is odd, hence invertible mod 2^64, which is what lets a
  PREFIX-sum difference recover any window sum: with
  T[k] = b[k] * Binv^k and P = cumsum(T),
  H(s) = (P[s+L] - P[s]) * B^(s+L-1) = sum_j b[s+j] * B^(L-1-j)
  (all arithmetic wraps mod 2^64). Hash equality is NECESSARY for
  content equality (recall 1); the pipeline's verify exchange restores
  precision 1 by grouping candidate windows by their actual bytes, so
  the hash needs no SQL replay and no collision analysis.

- ``reference_spans``: the SUFFIX-ARRAY form of the algorithm as the
  test oracle — build the (doc, offset) suffix array of the corpus,
  mark every window start whose suffix shares a prefix of >= min_len
  bytes with an SA-neighbor (equal-prefix suffixes are contiguous in
  SA order, so the neighbor check is exact), cover [s, s+L) and merge.
  O(n^2 log n) Python — planted/test corpora only.

Reference analogue: none in ad-si/Textalyzer (its duplication is exact
LINE groups, textalyzer/src/duplication.rs); this is the §2.9 LLM-data
extension surface, the byte-exact upgrade of the token-5-gram
approximation in pipelines/curation.py dup_span_removal.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
# odd (invertible mod 2^64) 64-bit multiplier: 2^64 / golden ratio
_B = 0x9E3779B97F4A7C15
_BINV = pow(_B, -1, 1 << 64)


def window_hashes(
    data: np.ndarray, starts: np.ndarray, min_len: int
) -> np.ndarray:
    """Rolling hash of every ``min_len``-byte window of ``data``
    (uint8) beginning at ``starts`` (int64, each start must satisfy
    start + min_len <= len(data)). Vectorized prefix trick — see
    module docstring."""
    n = len(data)
    if len(starts) == 0:
        return np.empty(0, _U64)
    pow_b = np.empty(n + 1, _U64)
    pow_b[0] = 1
    if n:
        np.cumprod(np.full(n, _B, _U64), out=pow_b[1:])
    pow_binv = np.empty(n, _U64)
    if n:
        pow_binv[0] = 1
        if n > 1:
            np.cumprod(np.full(n - 1, _BINV, _U64), out=pow_binv[1:])
    p = np.zeros(n + 1, _U64)
    if n:
        np.cumsum(data.astype(_U64) * pow_binv, out=p[1:])
    return (p[starts + min_len] - p[starts]) * pow_b[starts + min_len - 1]


def reference_spans(
    texts: dict[int, bytes], min_len: int
) -> list[tuple[int, int, int]]:
    """Suffix-array reference (TEST ORACLE ONLY): sorted (doc_id,
    span_start, span_end) maximal byte spans covered by some substring
    of length >= min_len occurring >= 2 times anywhere in the corpus
    (cross-doc or self-repeat)."""
    if min_len < 1:
        raise ValueError("min_len must be >= 1")
    suffixes = [
        (buf[off:], d, off)
        for d, buf in texts.items()
        for off in range(max(0, len(buf) - min_len + 1))
    ]
    suffixes.sort()
    dup_starts: dict[int, list[int]] = {d: [] for d in texts}
    for i, (s, d, off) in enumerate(suffixes):
        win = s[:min_len]
        for j in (i - 1, i + 1):
            if 0 <= j < len(suffixes) and suffixes[j][0][:min_len] == win:
                dup_starts[d].append(off)
                break
    spans = []
    for d, starts in dup_starts.items():
        starts.sort()
        cur_s = cur_e = None
        for s in starts:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    spans.append((d, cur_s, cur_e))
                cur_s, cur_e = s, s + min_len
            else:
                cur_e = s + min_len
        if cur_e is not None:
            spans.append((d, cur_s, cur_e))
    return sorted(spans)
