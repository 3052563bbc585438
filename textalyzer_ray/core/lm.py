"""Integer-bit bigram LM surprisal — CCNet-style perplexity filtering
with exact, engine-independent semantics.

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
KenLM n-gram model; low-quality pages score high. This module is that
filter with the log-probability quantized to INTEGER bits so every
engine reproduces it exactly (the CLAUDE.md hard-oracle rule):

    surprisal_bits(w1, w2) = bitlen(c1(w1) + V) - bitlen(c2(w1, w2) + 1)

which is ``round-ish log2( (c1+V) / (c2+1) )`` — the add-one-smoothed
bigram surprisal ``-log2 p(w2|w1)`` within 1 bit — where ``c2`` is the
bigram count in the reference slice, ``c1`` the unigram count (all
occurrences), and ``V`` the reference vocabulary size. A document's
score is the mean over its bigram occurrences: bits/token, i.e.
log2-perplexity up to the integer quantization.

Why integers: bitlen is exact in every engine (``int.bit_length`` ==
``np.frexp()[1]`` for x < 2^53 == DuckDB ``length(bin(x))``, the
CLAUDE.md np.log2-off-by-one note), sums of BIGINTs are exact, and the
final mean is ONE int/int double division — IEEE-identical in numpy and
DuckDB (the jaccard/classifier precedent). A real KenLM drops in by
replacing the count tables with its quantized log-prob table; the
storage/broadcast/lookup shape is identical.
"""

from __future__ import annotations

import numpy as np

from textalyzer_ray.core.textmetrics import tokenize


def bitlen_array(x: np.ndarray) -> np.ndarray:
    """Exact bit length per element for 0 <= x < 2^53 (int64 in, int64
    out; bitlen(0) = 0). np.frexp's exponent IS the bit length — unlike
    floor(log2)+1, which is off by one near powers of two."""
    return np.frexp(x.astype(np.float64))[1].astype(np.int64)


def train_counts(texts: list[str]) -> tuple[dict, dict, int]:
    """Scalar-reference model build over the slice: (c1 unigram counts,
    c2 bigram counts, V vocabulary size). c1 counts ALL occurrences
    (including document-final tokens — off by <= 1 per doc from the
    bigram-first-position denominator; documented, matched in SQL)."""
    c1: dict[str, int] = {}
    c2: dict[tuple[str, str], int] = {}
    for text in texts:
        toks = tokenize(text)
        for w in toks:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    return c1, c2, len(c1)


def surprisal_bits(c1: int, c2: int, v: int) -> int:
    """Integer add-one-smoothed bigram surprisal in bits."""
    return int(c1 + v).bit_length() - int(c2 + 1).bit_length()


def doc_surprisal(
    text: str, c1: dict, c2: dict, v: int
) -> tuple[int, int]:
    """Scalar reference scoring: (n_bigrams, total_bits). The vectorized
    stage (pipelines/lm.py) must match bit-for-bit (hypothesis-pinned)."""
    toks = tokenize(text)
    total = 0
    n = 0
    for a, b in zip(toks, toks[1:]):
        total += surprisal_bits(c1.get(a, 0), c2.get((a, b), 0), v)
        n += 1
    return n, total


def avg_bits(total_bits: int, n_bigrams: int) -> float:
    """Mean surprisal; 0.0 for documents with < 2 tokens. One int/int
    double division — bit-equal to DuckDB CAST(t AS DOUBLE)/n."""
    if n_bigrams == 0:
        return 0.0
    return total_bits / n_bigrams
