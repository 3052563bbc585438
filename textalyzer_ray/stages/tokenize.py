"""Tokenization stages — the hot path of the word-frequency pipeline.

Vectorized with pyarrow.compute RE2 kernels; ``[^\\pL]+`` equals the
oracle's ``[^\\p{L}]+`` split (core/textmetrics.py), reproducing the
reference tokenizer (textalyzer/src/frequency.rs:34-45: split on
non-alphabetic, drop empties, Unicode-lowercase).

``partial_word_counts`` is the combiner half of the classic
partial+final aggregate: each batch emits one (word, count) row per
distinct word in the batch, so the corpus-level ``groupby("word")``
shuffle moves per-batch partials, not per-occurrence rows. Hot-word skew
(stop words) is therefore bounded by the number of blocks, not by corpus
occurrences.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RE2 class \pL == regex module \p{L}; see core.textmetrics.
TOKEN_SPLIT_RE2 = r"[^\pL]+"

# pc.utf8_lower is utf8proc's SIMPLE 1:1 case mapping; Python str.lower()
# (== Rust to_lowercase(), frequency.rs:40) applies the FULL mapping. The
# non-locale divergence set is exactly: U+0130 İ -> "i̇" (the only
# unconditional multi-char lowercase in SpecialCasing.txt) and the
# contextual Final_Sigma rule for U+03A3 Σ. Tokens containing either get
# a Python .lower() fix-up; everything else stays on the Arrow kernel.
_FULL_LOWER_DIVERGENT = ["İ", "Σ"]


def _lower_tokens(flat: pa.Array) -> pa.Array:
    """Lowercase a token array with str.lower() semantics, vectorized
    except for the rare İ/Σ-bearing tokens."""
    lowered = pc.utf8_lower(flat)
    if len(flat) == 0:
        return lowered
    need = pc.match_substring(flat, _FULL_LOWER_DIVERGENT[0])
    for ch in _FULL_LOWER_DIVERGENT[1:]:
        need = pc.or_(need, pc.match_substring(flat, ch))
    if not pc.any(need).as_py():
        return lowered
    mask = need.to_numpy(zero_copy_only=False)
    idxs = np.flatnonzero(mask)
    fixed = pa.array([flat[int(i)].as_py().lower() for i in idxs], pa.string())
    return pc.replace_with_mask(lowered, need, fixed)


def _flat_tokens(table: pa.Table, text_col: str) -> tuple[pa.Array, pa.Array]:
    """Return (tokens, parent_doc_indices) for all non-empty lowercase
    tokens in the batch. Split FIRST on the raw text, then lowercase each
    token — the reference order (frequency.rs:34-45); lowering first would
    both change token boundaries (İ -> i+combining mark under the full
    mapping) and miss contextual mappings."""
    col = table[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.split_pattern_regex(col, TOKEN_SPLIT_RE2)
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    mask = pc.not_equal(flat, "")
    return _lower_tokens(flat.filter(mask)), parents.filter(mask)


def partial_word_counts(table: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial (word, count:int64) — combiner before the
    corpus groupby (SURVEY.md G1)."""
    tokens, _ = _flat_tokens(table, text_col)
    vc = pc.value_counts(tokens)
    return pa.table({"word": vc.field("values"), "count": vc.field("counts")})


def doc_token_counts(
    table: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Per-document token count (doc_id, n_tokens:int64), vectorized;
    documents with zero tokens get 0."""
    tokens, parents = _flat_tokens(table, text_col)
    n = table.num_rows
    import numpy as np

    counts = np.zeros(n, dtype=np.int64)
    if len(parents) > 0:
        np.add.at(counts, parents.to_numpy(zero_copy_only=False), 1)
    return pa.table({id_col: table[id_col], "n_tokens": pa.array(counts)})


def exploded_tokens(
    table: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """(doc_id, word) one row per token occurrence — for oracle-style
    checks and per-doc/word joins. Heavier than partial counts; prefer
    ``partial_word_counts`` for corpus aggregates."""
    tokens, parents = _flat_tokens(table, text_col)
    ids = table[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table({id_col: ids.take(parents), "word": tokens})
