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

import pyarrow as pa
import pyarrow.compute as pc

# RE2 class \pL == regex module \p{L}; see core.textmetrics.
TOKEN_SPLIT_RE2 = r"[^\pL]+"


def _flat_tokens(table: pa.Table, text_col: str) -> tuple[pa.Array, pa.Array]:
    """Return (tokens, parent_doc_indices) for all non-empty lowercase
    tokens in the batch, fully vectorized (no Python per row)."""
    col = table[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lowered = pc.utf8_lower(col)
    lists = pc.split_pattern_regex(lowered, TOKEN_SPLIT_RE2)
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    mask = pc.not_equal(flat, "")
    return flat.filter(mask), parents.filter(mask)


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
