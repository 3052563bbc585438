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


def sequence_pack(
    ds_docs: Dataset,
    seq_len: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Cross-document fixed-length training-sequence packing: the
    corpus's docs (in ``id_col`` order) are concatenated into one token
    stream — each doc's reference-tokenizer tokens followed by one EOS
    slot — and sliced into consecutive sequences of exactly ``seq_len``
    slots (the last may run short). Sequences SPAN document boundaries,
    the standard LLM-pretraining packing step (no padding waste).

    Rather than materializing token text, each sequence is summarized
    by exact integer aggregates a downstream loader (and the SQL
    oracle) can recompute: ``(seq_id, n_docs, n_slots, n_eos,
    first_doc, last_doc, cksum1, cksum2)`` where each slot's value v is
    ``token_byte_len + 1`` (EOS v = 1, unambiguous since real tokens
    have v >= 2) and ``cksum1 = sum((slot+1) * v)``,
    ``cksum2 = sum((slot+1)^2 * v)`` — position-weighted moments that
    pin both slot assignment and content lengths.

    Scale shape: text dies in the featurize (docs -> int32 length
    lists); the only exchanges are an id sort over int-list rows, the
    two-pass block-offset prefix scan of ``token_shard_assignment``
    (per-block scalars to the driver), and a ``key_counts`` merge over
    ~(n_docs + n_seqs) small partial rows. No text rides a shuffle.
    Reference analogue: none; §2.9 extension surface.
    """
    import pyarrow.compute as pc
    import ray

    from textalyzer_ray.stages.groups import _worker_object_cache, key_counts
    from textalyzer_ray.stages.tokenize import _flat_tokens

    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")

    feat_schema = pa.schema(
        [pa.field(id_col, pa.int64()), pa.field("lens", pa.list_(pa.int32()))]
    )

    def featurize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return feat_schema.empty_table()
        tokens, parents = _flat_tokens(t, text_col)
        lens = pc.binary_length(tokens).to_numpy(zero_copy_only=False)
        par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.bincount(par, minlength=t.num_rows)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(lens, pa.int32())
        )
        return pa.table({id_col: t[id_col], "lens": lists}).cast(feat_schema)

    counts_ds = (
        ds_docs.select_columns([id_col, text_col])
        .map_batches(featurize, batch_format="pyarrow", zero_copy_batch=True)
        .sort(id_col)
        .materialize()
    )

    # pass 1: per-block (min_id, total_slots) scalars -> exclusive
    # offsets on the driver (one int per block, any corpus size)
    def block_total(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"min_id": pa.array([], pa.int64()),
                 "total": pa.array([], pa.int64())}
            )
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = pc.list_value_length(t["lens"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "min_id": pa.array([int(ids.min())], pa.int64()),
                "total": pa.array([int(n.sum()) + len(n)], pa.int64()),
            }
        )

    per_block = counts_ds.map_batches(
        block_total, batch_format="pyarrow", batch_size=None
    ).take_all()
    per_block.sort(key=lambda r: r["min_id"])
    offsets: dict[int, int] = {}
    run = 0
    for r in per_block:
        offsets[r["min_id"]] = run
        run += r["total"]
    oref = ray.put(offsets)

    part_schema = pa.schema(
        [
            pa.field("seq_id", pa.int64()),
            pa.field(id_col, pa.int64()),
            pa.field("neg_doc", pa.int64()),
            pa.field("n_slots", pa.int64()),
            pa.field("n_eos", pa.int64()),
            pa.field("cksum1", pa.int64()),
            pa.field("cksum2", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        cache = _worker_object_cache()
        key = oref.hex() if hasattr(oref, "hex") else str(oref)
        offs = cache.get(key)
        if offs is None:
            offs = cache[key] = ray.get(oref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = pc.list_value_length(t["lens"]).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat_lens = pc.list_flatten(t["lens"]).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        slots = n + 1  # tokens + EOS per doc
        total = int(slots.sum())
        drow = np.repeat(np.arange(len(ids), dtype=np.int64), slots)
        doc_start = np.cumsum(slots) - slots
        j = np.arange(total, dtype=np.int64) - doc_start[drow]
        v = np.ones(total, dtype=np.int64)
        v[j < n[drow]] = flat_lens + 1  # doc-major order matches mask order
        p = int(offs[int(ids.min())]) + np.arange(total, dtype=np.int64)
        seq = p // seq_len
        slot1 = p % seq_len + 1
        # (doc, seq) segments: both monotone over the contiguous stream
        change = np.r_[True, (drow[1:] != drow[:-1]) | (seq[1:] != seq[:-1])]
        starts = np.flatnonzero(change)
        seg_len = np.diff(np.r_[starts, total])
        ck1 = np.add.reduceat(slot1 * v, starts)
        ck2 = np.add.reduceat(slot1 * slot1 * v, starts)
        eos = np.add.reduceat((v == 1).astype(np.int64), starts)
        doc = ids[drow[starts]]
        return pa.table(
            {
                "seq_id": seq[starts],
                id_col: doc,
                "neg_doc": -doc,
                "n_slots": seg_len,
                "n_eos": eos,
                "cksum1": ck1,
                "cksum2": ck2,
            },
            schema=part_schema,
        )

    parts = counts_ds.map_batches(
        partials, batch_format="pyarrow", batch_size=None
    )
    merged = key_counts(
        parts,
        ["seq_id"],
        min_cols=[id_col, "neg_doc"],
        sum_cols=["n_slots", "n_eos", "cksum1", "cksum2"],
    )

    out_schema = pa.schema(
        [
            pa.field("seq_id", pa.int64()),
            pa.field("n_docs", pa.int64()),
            pa.field("n_slots", pa.int64()),
            pa.field("n_eos", pa.int64()),
            pa.field("first_doc", pa.int64()),
            pa.field("last_doc", pa.int64()),
            pa.field("cksum1", pa.int64()),
            pa.field("cksum2", pa.int64()),
        ]
    )

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        return pa.table(
            {
                "seq_id": t["seq_id"],
                "n_docs": t["count"],
                "n_slots": t["sum_n_slots"],
                "n_eos": t["sum_n_eos"],
                "first_doc": t[f"min_{id_col}"],
                "last_doc": pc.negate(t["min_neg_doc"]),
                "cksum1": t["sum_cksum1"],
                "cksum2": t["sum_cksum2"],
            },
            schema=out_schema,
        )

    return merged.map_batches(
        project, batch_format="pyarrow", batch_size=None
    ).sort("seq_id")
