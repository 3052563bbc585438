"""Deterministic hashing / sketching primitives for dedup & fingerprinting.

Pure NumPy/stdlib (process-independent, seed-fixed — safe to compute on any
worker and compare across runs):

- ``stable_hash_u64``: blake2b-based 64-bit content hash (NOT Python's
  salted ``hash()``).
- ``shingles``: word k-grams.
- ``minhash_signature`` + ``lsh_band_keys``: MinHash/LSH near-dup keys
  (Broder '97 / Mining of Massive Datasets band technique).
- ``simhash64``: Charikar SimHash over token counts.
- ``winnowed_fingerprints``: rolling Karp-Rabin + winnowing (Schleimer et
  al. '03) document fingerprints.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAXU64 = (1 << 64) - 1


def stable_hash_u64(data: bytes | str) -> int:
    if isinstance(data, str):
        data = data.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")


def stable_hash_hex(data: bytes | str) -> str:
    if isinstance(data, str):
        data = data.encode("utf-8")
    return hashlib.blake2b(data, digest_size=16).hexdigest()


def shingles(tokens: list[str], k: int) -> list[str]:
    """Word k-grams joined with a space; shorter docs yield one shingle of
    all tokens (so every non-empty doc has at least one)."""
    if not tokens:
        return []
    if len(tokens) <= k:
        return [" ".join(tokens)]
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def _shingle_hashes(sh: list[str]) -> np.ndarray:
    """crc32(lo) << 32 | crc32(reversed) — cheap, deterministic u64 per
    shingle, adequate spread for MinHash bases."""
    out = np.empty(len(sh), dtype=np.uint64)
    for i, s in enumerate(sh):
        b = s.encode("utf-8")
        out[i] = (zlib.crc32(b) << 32) | zlib.crc32(b[::-1])
    return out


def minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature_from_hashes(
    base: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) from pre-hashed shingles;
    empty docs -> all MAXU64. Split out so a pipeline can hash shingles
    ONCE and reuse the u64 array for both the signature and exact
    hash-set Jaccard verification (no text through the shuffle)."""
    if len(base) == 0:
        return np.full(len(a), _MAXU64, dtype=np.uint64)
    # (P, S) universal hash in uint64 modular arithmetic (wraparound is
    # fine for min-selection as long as it is deterministic).
    vals = (a[:, None] * base[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def minhash_signature(
    tokens: list[str], k: int, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signature (uint64[num_perm]); empty docs -> all MAXU64."""
    return minhash_signature_from_hashes(_shingle_hashes(shingles(tokens, k)), a, b)


def lsh_band_keys(signature: np.ndarray, bands: int) -> list[tuple[int, int]]:
    """Split the signature into ``bands`` equal bands; key = (band_id,
    blake2b of the band bytes). Docs sharing any band key are candidates."""
    rows = len(signature) // bands
    keys = []
    for band in range(bands):
        chunk = signature[band * rows : (band + 1) * rows]
        keys.append((band, stable_hash_u64(chunk.tobytes())))
    return keys


def jaccard_from_hashes(ha: np.ndarray, hb: np.ndarray) -> float:
    """Exact Jaccard over unique-sorted shingle-hash arrays — equals the
    string-shingle ``jaccard`` modulo 64-bit hash collisions. This is the
    verification kernel for the no-text-through-the-shuffle LSH path."""
    if len(ha) == 0 and len(hb) == 0:
        return 1.0
    if len(ha) == 0 or len(hb) == 0:
        return 0.0
    inter = np.intersect1d(ha, hb, assume_unique=True).size
    return inter / (len(ha) + len(hb) - inter)


def shingle_hash_set(tokens: list[str], k: int) -> np.ndarray:
    """Unique-sorted u64 shingle hashes for a token list — the document
    feature carried (ONCE per doc) into LSH verification."""
    return np.unique(_shingle_hashes(shingles(tokens, k)))


def jaccard(tokens_a: list[str], tokens_b: list[str], k: int) -> float:
    sa, sb = set(shingles(tokens_a, k)), set(shingles(tokens_b, k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


_POLY_B = 1_000_003
_POLY_C = 0x2545F4914F6CDD1D  # odd, < 2^62 so h*C fits signed 128-bit


def polyhash64(data: bytes | str) -> int:
    """SQL-expressible deterministic 64-bit string hash: rolling
    polynomial over UTF-8 bytes (h = h*B + byte mod 2^64), one odd
    multiplicative mix, then the high half XOR-folded into the low half
    so short strings still populate all 64 bits. Every step (powers of
    B via a recursive CTE, HUGEINT modular products, 32-bit-half xor)
    runs verbatim in DuckDB — this is the hash that lets a SimHash
    driver query be verified by a pure-SQL oracle. NOT a replacement
    for ``stable_hash_u64`` where adversarial spread matters."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    h = 0
    for byte in data:
        h = (h * _POLY_B + byte) & _MAXU64
    m = (h * _POLY_C) & _MAXU64
    hi = m >> 32
    lo = (m & 0xFFFFFFFF) ^ hi
    return (hi << 32) | lo


def polyhash64_array(words: list[str]) -> np.ndarray:
    """Vectorized ``polyhash64`` over a word list -> uint64 array,
    bit-identical to the scalar function (pinned by tests). Horner over
    byte COLUMNS: one uint64 multiply-add per byte position with a
    not-yet-ended mask, so hashing a vocabulary costs max_word_len
    vectorized steps instead of a Python loop per token — this is what
    makes the SQL-recomputable hash usable in per-batch sketch stages
    (stages/sketch.py hll_partial_batch)."""
    if not words:
        return np.zeros(0, dtype=np.uint64)
    bs = [w.encode("utf-8") for w in words]
    lens = np.fromiter((len(b) for b in bs), np.int64, len(bs))
    maxlen = int(lens.max()) if len(lens) else 0
    buf = np.zeros((len(bs), maxlen), dtype=np.uint8)
    for i, b in enumerate(bs):
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
    h = np.zeros(len(bs), dtype=np.uint64)
    B = np.uint64(_POLY_B)
    for j in range(maxlen):
        active = lens > j
        h[active] = h[active] * B + buf[active, j].astype(np.uint64)
    m = h * np.uint64(_POLY_C)
    hi = m >> np.uint64(32)
    lo = (m & np.uint64(0xFFFFFFFF)) ^ hi
    return (hi << np.uint64(32)) | lo


_FMIX_K1 = 0xFF51AFD7ED558CCD
_FMIX_K2 = 0xC4CEB9FE1A85EC53


def hll_hash64(data: bytes | str) -> int:
    """``polyhash64`` strengthened with the murmur3 fmix64 finalizer —
    still fully SQL-expressible (an xorshift-33 is just lo ^= hi >> 1 on
    the 32-bit halves; the multiplies are HUGEINT modular products).
    polyhash64's single multiply leaves leading-zero-count structure on
    lattice-like vocabularies (sequential short words measured +13.5%
    HLL error at p=12); fmix64 restores avalanche (measured ±1%, inside
    the sketch's own band). Kept separate from ``polyhash64`` because
    the SimHash driver oracle reproduces that function bit-for-bit."""
    h = polyhash64(data)
    for k in (_FMIX_K1, _FMIX_K2):
        h ^= h >> 33
        h = (h * k) & _MAXU64
    return h ^ (h >> 33)


def hll_hash64_array(words: list[str]) -> np.ndarray:
    """Vectorized ``hll_hash64`` (bit-identical; pinned by tests)."""
    h = polyhash64_array(words)
    for k in (_FMIX_K1, _FMIX_K2):
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(k)
    return h ^ (h >> np.uint64(33))


def simhash64(token_counts: dict[str, int], hash_fn=stable_hash_u64) -> int:
    """Charikar SimHash: per-token 64-bit hash, count-weighted bit votes.

    ``hash_fn`` picks the per-token hash: ``stable_hash_u64`` (default,
    blake2b) or ``polyhash64`` (SQL-recomputable, used by driver-gated
    queries so DuckDB can verify the pair set exactly)."""
    if not token_counts:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for tok, cnt in token_counts.items():
        h = hash_fn(tok)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), cnt, -cnt)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(x: int, y: int) -> int:
    return bin(x ^ y).count("1")


def winnowed_fingerprints(text: str, k: int = 8, window: int = 4) -> list[int]:
    """Winnowing fingerprints: rolling k-byte Karp-Rabin hashes, take the
    min of each sliding window of ``window`` hashes (rightmost min on
    ties), dedup consecutive picks. Deterministic document fingerprint."""
    data = text.encode("utf-8")
    n = len(data)
    if n == 0:
        return []
    if n <= k:
        return [stable_hash_u64(data)]
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    base = np.uint64(1_000_003)
    # rolling polynomial hash of every k-byte window, vectorized via cumsum
    # over base powers is numerically unstable in uint64 wraparound terms —
    # use the standard O(n) rolling loop in numpy-chunked form instead.
    hashes = np.empty(n - k + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):  # intentional uint64 wraparound
        h = np.uint64(0)
        top = base ** np.uint64(k - 1)
        for i in range(k):
            h = h * base + arr[i]
        hashes[0] = h
        for i in range(1, n - k + 1):
            h = (h - arr[i - 1] * top) * base + arr[i + k - 1]
            hashes[i] = h
    if len(hashes) <= window:
        return [int(hashes.min())]
    # sliding-window minimum via stride tricks
    sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
    mins = sw.min(axis=1)
    out: list[int] = []
    prev = None
    for m in mins:
        if prev is None or m != prev:
            out.append(int(m))
            prev = m
    return out
