"""Sliding-window document chunking (RAG / training-context prep).

Splits each document's word sequence (single-space split, the same
derived-word view as the 6-word line chunker in ``__ray_entry__``)
into overlapping windows of ``size`` words advancing by ``stride``
(overlap = size - stride) — the standard retrieval-corpus /
context-window chunking step. A document with n words yields
``(max(n - size, 0) + stride - 1) // stride + 1`` chunks; the last
window is allowed to run short, and ``stride <= size`` guarantees it
is never empty.

Scale shape: a pure row-expanding ``map_batches`` — zero shuffle, zero
state, fully streaming; the only care is vectorization (window
expansion via one numpy repeat/arange per batch, window slicing via
one ``polars list.slice`` expression — no per-row Python) and a
``repartition`` after the expansion when a CPU-heavy stage follows
(operator fusion plans bundles on pre-expansion rows, CLAUDE.md).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
from ray.data import Dataset

OUT_SCHEMA_FIELDS = ["chunk_id", "n_words", "chunk_text"]


def chunk_windows(
    ds_docs: Dataset,
    size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """(id_col, chunk_id, n_words, chunk_text) for every sliding window
    over each document's space-split words. Deterministic and
    partitioning-invariant (chunk boundaries depend only on the row)."""
    if not 1 <= stride <= size:
        raise ValueError("need 1 <= stride <= size")

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("chunk_id", pa.int64()),
            pa.field("n_words", pa.int64()),
            pa.field("chunk_text", pa.string()),
        ]
    )

    def chunks(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(t.select([id_col, text_col])).with_columns(
            pl.col(text_col).str.split(" ").alias("ws")
        )
        n = df["ws"].list.len().cast(pl.Int64).to_numpy()
        counts = np.maximum(n - size, 0) // stride + np.where(
            np.maximum(n - size, 0) % stride, 1, 0
        ) + 1
        row = np.repeat(np.arange(len(n)), counts)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        k = np.arange(len(row)) - offsets[row]
        exp = df[row].with_columns(
            pl.Series("chunk_id", k, dtype=pl.Int64)
        )
        win = pl.col("ws").list.slice(pl.col("chunk_id") * stride, size)
        out = exp.select(
            pl.col(id_col),
            pl.col("chunk_id"),
            win.list.len().cast(pl.Int64).alias("n_words"),
            win.list.join(" ").alias("chunk_text"),
        )
        return out.to_arrow().cast(out_schema)

    return ds_docs.select_columns([id_col, text_col]).map_batches(
        chunks, batch_format="pyarrow", zero_copy_batch=True
    )
