"""Hashed-linear text classifier — fastText-style inference semantics.

The model is a weight vector over ``HASH_DIM`` feature buckets plus an
implicit zero bias; a document's logit is the sum of the weights of its
token buckets (one vote per token OCCURRENCE, the fastText bag-of-words
sum before mean-pooling), and its score is the mean-pooled per-token
weight ``logit / (1000 * n_tokens)`` in [-1, 1]. ``keep`` is the sign
of the logit — an integer decision, so the filter semantic never rests
on a float comparison.

Everything here is engine-independent EXACT semantics (the CLAUDE.md
core/ rule): the token hash is ``core.fingerprint.polyhash64`` (the
SQL-recomputable hash, so a DuckDB oracle can replay inference
bit-for-bit) and the weights are derived from the bucket index by one
modular multiply — a deterministic stand-in for trained weights with
the same storage/broadcast/lookup shape. A real trained model drops in
by replacing ``hashed_weights`` with a loaded array of the same dtype;
nothing else changes.

Integer weights are the trick that makes inference hard-oracle-able:
``logit`` is a BIGINT sum (exact in any engine), and ``score`` is a
single int/int double division — IEEE-identical in numpy and DuckDB
(the jaccard-oracle precedent), so even the float column hash-matches.
"""

from __future__ import annotations

import numpy as np

from textalyzer_ray.core.fingerprint import _POLY_C, polyhash64
from textalyzer_ray.core.textmetrics import tokenize

# 2^16 buckets: small enough to broadcast everywhere (512 KB as int64),
# large enough that the sf corpora's ~30k-word vocabulary collides
# rarely. fastText's default is 2M for word-ngrams; dim is a parameter.
HASH_DIM = 65536

# Weight scale: w[b] in [-1000, 1000] "milli-units", so score =
# logit / (1000 * n_tokens) lands in [-1, 1] like a mean-pooled
# normalized weight.
WEIGHT_SCALE = 1000
_MAXU64 = (1 << 64) - 1


def hashed_weights(dim: int = HASH_DIM) -> np.ndarray:
    """Deterministic int64 weight vector: w[b] =
    ((b * C mod 2^64) >> 32) % 2001 - 1000 with C = fingerprint._POLY_C.
    One HUGEINT-expressible modular multiply per bucket (b < 2^16 keeps
    b*C < 2^78, inside the CLAUDE.md signed-INT128 budget), so a SQL
    oracle recomputes the weight from the bucket index instead of
    joining a shipped weight table."""
    b = np.arange(dim, dtype=np.uint64)
    m = b * np.uint64(_POLY_C)  # wraps mod 2^64
    return ((m >> np.uint64(32)) % np.uint64(2 * WEIGHT_SCALE + 1)).astype(
        np.int64
    ) - WEIGHT_SCALE


def token_bucket(token: str, dim: int = HASH_DIM) -> int:
    """Feature bucket of one (lowercased) token."""
    return polyhash64(token) % dim


def classify_text(
    text: str, weights: np.ndarray | None = None, dim: int = HASH_DIM
) -> tuple[int, int]:
    """Scalar reference inference: (n_tokens, logit). The vectorized
    stage (pipelines/classify.py) must match this bit-for-bit
    (hypothesis-pinned)."""
    if weights is None:
        weights = hashed_weights(dim)
    toks = tokenize(text)
    logit = 0
    for t in toks:
        logit += int(weights[polyhash64(t) % dim])
    return len(toks), logit


def score_of(logit: int, n_tokens: int) -> float:
    """Mean-pooled score; 0.0 for empty documents. Single int/int double
    division — bit-equal to DuckDB CAST(logit AS DOUBLE)/(1000*n)."""
    if n_tokens == 0:
        return 0.0
    return logit / (WEIGHT_SCALE * n_tokens)
