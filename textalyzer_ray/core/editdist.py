"""Exact Levenshtein distance kernels for the edit-similarity join.

Public algorithms: Myers' bit-parallel edit distance (Gene Myers, "A
fast bit-vector algorithm for approximate string matching based on
dynamic programming", JACM 46(3), 1999) for the vectorized verifier,
and the classic Wagner-Fischer DP as the scalar reference oracle the
property tests pin the bit-parallel kernel against.

Byte semantics: distances are computed over raw byte strings, which
matches DuckDB's ``levenshtein`` (measured: ``levenshtein('héllo',
'hello') = 2`` — the two-byte UTF-8 é counts per byte). Callers that
need codepoint semantics must not use these kernels; the planted
edit-join corpus is ASCII-only so the two coincide there.

Reference analogue: none (the reference detects duplication only via
exact line groups, textalyzer/src/duplication.rs); this is the §2.9
extension surface.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_ONE = _U64(1)


def levenshtein_ref(a: bytes, b: bytes) -> int:
    """Wagner-Fischer O(|a|*|b|) reference. Test oracle only."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def levenshtein_batch(
    pats: list[bytes], texts: list[bytes]
) -> np.ndarray:
    """Exact Levenshtein distance for each (pats[i], texts[i]) pair,
    vectorized across the pair axis with Myers' bit-vector recurrence:
    the whole batch advances one text byte per step, each step a dozen
    uint64 bitwise ops over all pairs at once — no per-pair Python in
    the hot path. Requires every pattern length <= 64 (one machine
    word); pairs where the pattern is empty return len(text) directly.

    The global-distance boundary condition (D[0][j] = j) is the
    ``Ph = (Ph << 1) | 1`` carry-in; score starts at m and is updated
    by the sign bit at pattern position m-1. Pinned bit-identical to
    ``levenshtein_ref`` by hypothesis tests."""
    n_pairs = len(pats)
    if n_pairs != len(texts):
        raise ValueError("pats and texts must be the same length")
    out = np.zeros(n_pairs, np.int64)
    if n_pairs == 0:
        return out
    m = np.fromiter((len(p) for p in pats), np.int64, n_pairs)
    n = np.fromiter((len(t) for t in texts), np.int64, n_pairs)
    if int(m.max(initial=0)) > 64:
        raise ValueError("pattern length must be <= 64 for the bit kernel")
    empty_pat = m == 0
    out[empty_pat] = n[empty_pat]
    live = np.flatnonzero(~empty_pat)
    if live.size == 0:
        return out
    m_l = m[live]
    n_l = n[live]
    max_n = int(n_l.max(initial=0))
    # pattern byte matrix + per-pair Peq[char] masks (scatter once)
    pat_buf = np.zeros((live.size, 64), np.uint8)
    for k, i in enumerate(live):
        pb = pats[i]
        pat_buf[k, : len(pb)] = np.frombuffer(pb, np.uint8)
    txt_buf = np.zeros((live.size, max_n), np.uint8)
    for k, i in enumerate(live):
        tb = texts[i]
        txt_buf[k, : len(tb)] = np.frombuffer(tb, np.uint8)
    peq = np.zeros((live.size, 256), _U64)
    rows = np.arange(live.size)
    for j in range(int(m_l.max())):
        has = m_l > j
        peq[rows[has], pat_buf[has, j]] |= _ONE << _U64(j)
    hibit = _ONE << (m_l.astype(_U64) - _ONE)
    full = np.full(live.size, ~np.uint64(0), _U64)
    pv = np.where(
        m_l == 64, full, (_ONE << m_l.astype(_U64)) - _ONE
    ).astype(_U64)
    mv = np.zeros(live.size, _U64)
    score = m_l.copy()
    for step in range(max_n):
        active = n_l > step
        eq = peq[rows, txt_buf[:, step]]
        xv = eq | mv
        xh = (((eq & pv) + pv) ^ pv) | eq
        ph = mv | ~(xh | pv)
        mh = pv & xh
        score = score + np.where(active & ((ph & hibit) != 0), 1, 0)
        score = score - np.where(active & ((mh & hibit) != 0), 1, 0)
        ph = (ph << _ONE) | _ONE
        mh = mh << _ONE
        new_pv = mh | ~(xv | ph)
        new_mv = ph & xv
        pv = np.where(active, new_pv, pv)
        mv = np.where(active, new_mv, mv)
    out[live] = score
    return out


def gram_ids(s: bytes, q: int) -> np.ndarray:
    """Distinct q-gram ids of a byte string as sorted uint64 (gram
    bytes big-endian packed — q <= 8; no hashing, so the global
    (df, id) prefix order is collision-free by construction). Strings
    shorter than q yield an empty set."""
    if q > 8:
        raise ValueError("q must be <= 8")
    b = np.frombuffer(s, np.uint8).astype(np.uint64)
    if len(b) < q:
        return np.empty(0, np.uint64)
    g = np.zeros(len(b) - q + 1, np.uint64)
    for j in range(q):
        g = (g << _U64(8)) | b[j : len(b) - q + 1 + j]
    return np.unique(g)
