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
    """Exact Levenshtein distance for each (pats[i], texts[i]) pair.
    List-of-bytes front end for :func:`levenshtein_matrix` /
    :func:`levenshtein_peq_multi` (the vectorized Myers cores); buffer
    packing here is a per-pair Python loop, so corpus-scale callers
    should build the byte matrices vectorized and call the matrix forms
    directly (editsim does). Patterns <= 64 bytes take the one-word
    kernel; longer patterns route to the multi-word kernel."""
    n_pairs = len(pats)
    if n_pairs != len(texts):
        raise ValueError("pats and texts must be the same length")
    if n_pairs == 0:
        return np.zeros(0, np.int64)
    m = np.fromiter((len(p) for p in pats), np.int64, n_pairs)
    n = np.fromiter((len(t) for t in texts), np.int64, n_pairs)
    max_m = int(m.max(initial=0))
    w = max(1, (max_m + 63) // 64)
    pat_buf = np.zeros((n_pairs, 64 * w), np.uint8)
    for k, pb in enumerate(pats):
        pat_buf[k, : len(pb)] = np.frombuffer(pb, np.uint8)
    max_n = int(n.max(initial=0))
    txt_buf = np.zeros((n_pairs, max(max_n, 1)), np.uint8)
    for k, tb in enumerate(texts):
        txt_buf[k, : len(tb)] = np.frombuffer(tb, np.uint8)
    if w == 1:
        return levenshtein_matrix(pat_buf, m, txt_buf, n)
    peq = build_peq_multi(pat_buf, m)
    return levenshtein_peq_multi(
        peq, np.arange(n_pairs, dtype=np.int64), m, txt_buf, n
    )


def levenshtein_matrix(
    pat_buf: np.ndarray,
    m: np.ndarray,
    txt_buf: np.ndarray,
    n: np.ndarray,
) -> np.ndarray:
    """Exact Levenshtein distance for row-aligned byte matrices,
    vectorized across the pair axis with Myers' bit-vector recurrence:
    the whole batch advances one text byte per step, each step a dozen
    uint64 bitwise ops over all pairs at once — no per-pair Python in
    the hot path. ``pat_buf`` is (k, 64) zero-padded pattern bytes with
    lengths ``m`` (every m <= 64 — one machine word); ``txt_buf`` is
    (k, >=max(n)) zero-padded text bytes with lengths ``n``. Pairs
    where the pattern is empty return len(text) directly.

    The global-distance boundary condition (D[0][j] = j) is the
    ``Ph = (Ph << 1) | 1`` carry-in; score starts at m and is updated
    by the sign bit at pattern position m-1. Pinned bit-identical to
    ``levenshtein_ref`` by hypothesis tests."""
    peq = build_peq(pat_buf, m)
    return levenshtein_peq(
        peq, np.arange(len(m), dtype=np.int64), m, txt_buf, n
    )


def build_peq(pat_buf: np.ndarray, m: np.ndarray) -> np.ndarray:
    """(k, 256) uint64 Myers Peq[char] match masks for zero-padded
    pattern rows ``pat_buf`` (k, 64) with lengths ``m``. Build ONCE per
    distinct pattern set and share across pairs via the ``pat_ix``
    argument of :func:`levenshtein_peq` — a per-pair Peq table is
    k*2 KiB and was the measured editsim verify bottleneck."""
    k = len(m)
    peq = np.zeros((k, 256), _U64)
    if k == 0:
        return peq
    if int(m.max(initial=0)) > 64:
        raise ValueError("pattern length must be <= 64 for the bit kernel")
    rows = np.arange(k)
    # rows are distinct within each position j -> fancy |= is safe
    for j in range(int(m.max(initial=0))):
        has = m > j
        peq[rows[has], pat_buf[has, j]] |= _ONE << _U64(j)
    return peq


def levenshtein_peq(
    peq: np.ndarray,
    pat_ix: np.ndarray,
    m: np.ndarray,
    txt_buf: np.ndarray,
    n: np.ndarray,
) -> np.ndarray:
    """Myers bit-vector distances where pair i's pattern is row
    ``pat_ix[i]`` of the shared ``peq`` table (lengths ``m`` aligned to
    pairs). See :func:`levenshtein_matrix` for the recurrence notes."""
    n_pairs = len(m)
    out = np.zeros(n_pairs, np.int64)
    if n_pairs == 0:
        return out
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
    pix = pat_ix[live]
    txt_buf = txt_buf[live]
    hibit = _ONE << (m_l.astype(_U64) - _ONE)
    full = np.full(live.size, ~np.uint64(0), _U64)
    pv = np.where(
        m_l == 64, full, (_ONE << m_l.astype(_U64)) - _ONE
    ).astype(_U64)
    mv = np.zeros(live.size, _U64)
    score = m_l.copy()
    for step in range(max_n):
        active = n_l > step
        eq = peq[pix, txt_buf[:, step]]
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


def build_peq_multi(pat_buf: np.ndarray, m: np.ndarray) -> np.ndarray:
    """(k, 256, W) uint64 Myers Peq[char] match masks for zero-padded
    pattern rows ``pat_buf`` (k, 64*W) with byte lengths ``m`` — the
    multi-word generalization of :func:`build_peq` (Myers 1999 §5
    block form, as in Hyyrö 2003): pattern bit j lives in word j//64,
    bit j%64. ~2 KiB * W per distinct pattern — callers share ONE
    table per block via ``pat_ix``."""
    k = len(m)
    w = max(1, pat_buf.shape[1] // 64) if pat_buf.ndim == 2 else 1
    peq = np.zeros((k, 256, w), _U64)
    if k == 0:
        return peq
    if int(m.max(initial=0)) > 64 * w:
        raise ValueError("pattern length exceeds the padded buffer width")
    rows = np.arange(k)
    for j in range(int(m.max(initial=0))):
        has = m > j
        peq[rows[has], pat_buf[has, j], j // 64] |= _ONE << _U64(j % 64)
    return peq


def levenshtein_peq_multi(
    peq: np.ndarray,
    pat_ix: np.ndarray,
    m: np.ndarray,
    txt_buf: np.ndarray,
    n: np.ndarray,
    chunk: int = 1 << 18,
) -> np.ndarray:
    """Exact Levenshtein distances with MULTI-WORD Myers bit-vectors:
    pair i's pattern is row ``pat_ix[i]`` of the shared (k, 256, W)
    ``peq`` table, pattern lengths ``m`` <= 64*W. The column bit-vector
    is W uint64 words per pair; per text byte the batch advances with
    the one-word recurrence run word-by-word (low to high) carrying

    - the multi-precision ADD carry through ``(Eq & Pv) + Pv``, and
    - the Ph/Mh left-shift carry (Ph's bottom carry-in is the global
      boundary D[0][j] = j, exactly the one-word ``(Ph << 1) | 1``),

    which IS the W*64-bit integer recurrence of Myers' block algorithm
    (Myers 1999; Hyyrö, "A bit-vector algorithm for computing
    Levenshtein and Damerau edit distances", 2003). Dead words above a
    pattern's own ceil(m/64) hold garbage but carries flow strictly
    upward and the score reads only the pattern's top bit — pinned
    bit-identical to ``levenshtein_ref`` by hypothesis tests. Pairs
    are processed in ``chunk`` slices to bound the (pairs, W) live
    arrays."""
    n_pairs = len(m)
    out = np.zeros(n_pairs, np.int64)
    if n_pairs == 0:
        return out
    w = peq.shape[2]
    if int(m.max(initial=0)) > 64 * w:
        raise ValueError("pattern length exceeds the Peq word width")
    for lo in range(0, n_pairs, chunk):
        sl = slice(lo, min(lo + chunk, n_pairs))
        out[sl] = _lev_multi_chunk(peq, pat_ix[sl], m[sl], txt_buf[sl], n[sl])
    return out


def _lev_multi_chunk(
    peq: np.ndarray,
    pat_ix: np.ndarray,
    m: np.ndarray,
    txt_buf: np.ndarray,
    n: np.ndarray,
) -> np.ndarray:
    w = peq.shape[2]
    n_pairs = len(m)
    out = np.zeros(n_pairs, np.int64)
    empty_pat = m == 0
    out[empty_pat] = n[empty_pat]
    live = np.flatnonzero(~empty_pat)
    if live.size == 0:
        return out
    m_l = m[live]
    n_l = n[live]
    max_n = int(n_l.max(initial=0))
    pix = pat_ix[live]
    txt = txt_buf[live]
    k = live.size
    rows = np.arange(k)
    hw = ((m_l - 1) // 64).astype(np.int64)  # hibit word per pair
    hibit = _ONE << ((m_l - 1) % 64).astype(_U64)
    # Pv init: low m bits set across words
    bits_in_w = np.clip(
        m_l[:, None] - 64 * np.arange(w)[None, :], 0, 64
    ).astype(_U64)
    full = ~np.uint64(0)
    pv = np.where(
        bits_in_w == 64,
        full,
        (_ONE << bits_in_w) - _ONE,
    ).astype(_U64)
    mv = np.zeros((k, w), _U64)
    score = m_l.copy()
    eq = np.empty((k, w), _U64)
    xh = np.empty((k, w), _U64)
    ph = np.empty((k, w), _U64)
    mh = np.empty((k, w), _U64)
    for step in range(max_n):
        active = n_l > step
        eq[:] = peq[pix, txt[:, step]]
        # multi-precision (Eq & Pv) + Pv, word-by-word carry
        carry = np.zeros(k, _U64)
        for j in range(w):
            a = eq[:, j] & pv[:, j]
            t1 = a + pv[:, j]
            c1 = t1 < a
            t2 = t1 + carry
            c2 = t2 < t1
            xh[:, j] = (t2 ^ pv[:, j]) | eq[:, j]
            carry = (c1 | c2).astype(_U64)
        ph[:] = mv | ~(xh | pv)
        mh[:] = pv & xh
        ph_top = ph[rows, hw]
        mh_top = mh[rows, hw]
        score = score + np.where(active & ((ph_top & hibit) != 0), 1, 0)
        score = score - np.where(active & ((mh_top & hibit) != 0), 1, 0)
        # left shift by 1 across words; Ph bottom carry-in = 1 (D[0][j]=j)
        ph_c = np.full(k, _ONE, _U64)
        mh_c = np.zeros(k, _U64)
        for j in range(w):
            ph_hi = ph[:, j] >> _U64(63)
            mh_hi = mh[:, j] >> _U64(63)
            sph = (ph[:, j] << _ONE) | ph_c
            smh = (mh[:, j] << _ONE) | mh_c
            xv = eq[:, j] | mv[:, j]
            new_pv = smh | ~(xv | sph)
            new_mv = sph & xv
            pv[:, j] = np.where(active, new_pv, pv[:, j])
            mv[:, j] = np.where(active, new_mv, mv[:, j])
            ph_c, mh_c = ph_hi, mh_hi
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
