"""Content-defined chunking (CDC) duplicate-chunk detection.

Public algorithms: Rabin-style rolling-window content-defined chunking
(Muthitacharoen-Chen-Mazières, "A low-bandwidth network file system",
SOSP 2001 — the LBFS chunking scheme) over the repo's SQL-expressible
polynomial hash (core/fingerprint.polyhash64's B/C constants and
hi-into-lo fold, so a DuckDB oracle replays every boundary decision
bit-for-bit).

A byte position i (0-based) ends a chunk when the 16-byte window
terminating at i satisfies ``fold(W_i * C) & (2^mask_bits - 1) ==
remainder`` with W_i the polynomial sum of the window bytes mod 2^64.
Boundaries depend only on local CONTENT, never on position — the CDC
property: a duplicated passage yields identical chunks in every doc
that contains it regardless of byte offset, which is what makes
chunk-level dedup robust to insertions (fixed-size blocking is not).
This is the pure LBFS scheme with no min/max chunk clamps: clamps
re-introduce a sequential dependence between boundaries (eligibility
would depend on the previous cut) that would both break the
embarrassing parallelism of the boundary scan and make the SQL replay
stateful. Average chunk = 2^mask_bits bytes past the window warm-up.

Scale shape: the boundary scan is ONE batched numpy pass — the whole
batch's text concatenates into a single byte array, the window sum is
16 vectorized multiply-adds over it, and windows straddling document
boundaries are masked out; no per-byte Python anywhere. Chunk rows
pre-aggregate per block — polars group_by (chunk, doc) — before the
single chunk-keyed exchange (exact content grouping must ship content
once; that exchange is data-sized, the same cost the C4 line-dedup
family pays and the SQL oracle's GROUP BY pays). Output is the
corpus-duplicated chunk groups only.

Byte semantics: hashing runs over UTF-8 bytes; chunk boundaries can in
principle split a multi-byte codepoint, so chunks are returned as the
BYTE slices re-decoded with surrogateescape-free strict UTF-8 only
when the corpus is ASCII (asserted per batch) — the documents tables
are measured ASCII-only at every sf; binary payloads would return
chunks as binary instead (growth path, same hash math).

Reference analogue: none (the reference's duplication is exact line
groups, textalyzer/src/duplication.rs); §2.9 extension surface.
"""

from __future__ import annotations

import logging

import numpy as np
import polars as pl
import pyarrow as pa
from ray.data import Dataset

from textalyzer_ray.core.fingerprint import _POLY_B, _POLY_C

logger = logging.getLogger(__name__)

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def batch_boundaries(
    texts: list[bytes], window: int, mask_bits: int, remainder: int
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_starts, boundary_end_positions) for a batch: ONE set of
    ``window`` vectorized multiply-adds over the concatenated byte
    array; windows straddling a document edge are masked out.
    ``boundary_end_positions`` are 0-based GLOBAL indices of chunk-final
    bytes; ``doc_starts`` has len(texts)+1 entries (global offsets)."""
    lens = np.fromiter((len(t) for t in texts), np.int64, len(texts))
    starts = np.zeros(len(texts) + 1, np.int64)
    np.cumsum(lens, out=starts[1:])
    flat = (
        np.frombuffer(b"".join(texts), np.uint8).astype(np.uint64)
        if starts[-1]
        else np.empty(0, np.uint64)
    )
    n = len(flat)
    if n < window:
        return starts, np.empty(0, np.int64)
    wsum = np.zeros(n - window + 1, np.uint64)
    for j in range(window):
        coef = np.uint64(pow(_POLY_B, window - 1 - j, 1 << 64))
        wsum += flat[j : n - window + 1 + j] * coef
    m = wsum * np.uint64(_POLY_C)
    hi = m >> np.uint64(32)
    lo = (m & np.uint64(0xFFFFFFFF)) ^ hi
    hit = (lo & np.uint64((1 << mask_bits) - 1)) == np.uint64(remainder)
    # window [s, s+window) must lie inside one doc: its END byte
    # e = s + window - 1 must be in the same doc as s
    s_ix = np.flatnonzero(hit)
    if s_ix.size == 0:
        return starts, np.empty(0, np.int64)
    e_ix = s_ix + window - 1
    doc_of_s = np.searchsorted(starts, s_ix, side="right") - 1
    doc_of_e = np.searchsorted(starts, e_ix, side="right") - 1
    keep = doc_of_s == doc_of_e
    return starts, e_ix[keep]


def chunk_rows(
    t: pa.Table,
    id_col: str,
    text_col: str,
    window: int,
    mask_bits: int,
    remainder: int,
) -> pa.Table:
    """(chunk, id, occ) partial rows for one batch: CDC split, then an
    in-batch polars pre-aggregate so the chunk-keyed exchange ships one
    row per (chunk, doc) of this block."""
    schema = pa.schema(
        [
            pa.field("chunk", pa.string()),
            pa.field(id_col, pa.int64()),
            pa.field("occ", pa.int64()),
        ]
    )
    if t.num_rows == 0:
        return schema.empty_table()
    texts = [(s or "").encode("utf-8") for s in t[text_col].to_pylist()]
    for s, b in zip(t[text_col].to_pylist(), texts):
        if len(s or "") != len(b):
            raise ValueError(
                "cdc chunking over non-ASCII text is not implemented "
                "(chunk boundaries could split a codepoint); see module "
                "docstring"
            )
    ids = t[id_col].to_pylist()
    starts, ends = batch_boundaries(texts, window, mask_bits, remainder)
    chunks: list[str] = []
    chunk_ids: list[int] = []
    doc_of_end = (
        np.searchsorted(starts, ends, side="right") - 1
        if ends.size
        else np.empty(0, np.int64)
    )
    flat = b"".join(texts)
    by_doc: dict[int, list[int]] = {}
    for e, d in zip(ends.tolist(), doc_of_end.tolist()):
        by_doc.setdefault(d, []).append(e)
    for d, (st, en) in enumerate(zip(starts[:-1], starts[1:])):
        if en == st:
            continue
        cur = int(st)
        for e in by_doc.get(d, ()):
            chunks.append(flat[cur : e + 1].decode("utf-8"))
            chunk_ids.append(ids[d])
            cur = e + 1
        if cur < en:
            chunks.append(flat[cur:en].decode("utf-8"))
            chunk_ids.append(ids[d])
    if not chunks:
        return schema.empty_table()
    part = (
        pl.DataFrame({"chunk": chunks, id_col: chunk_ids})
        .group_by(["chunk", id_col])
        .len()
        .rename({"len": "occ"})
        .cast({"occ": pl.Int64, id_col: pl.Int64})
        .select(["chunk", id_col, "occ"])
    )
    return part.to_arrow().cast(schema)


def cdc_duplicate_chunks(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 16,
    mask_bits: int = 5,
    remainder: int = 7,
    min_occ: int = 2,
) -> Dataset:
    """(chunk, n_docs, n_occ) for every CDC chunk that occurs at least
    ``min_occ`` times in the corpus (across or within docs), ordered by
    chunk. Exact: content-equal chunks group by value, the hash only
    picks boundaries."""
    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    out_schema = pa.schema(
        [
            pa.field("chunk", pa.string()),
            pa.field("n_docs", pa.int64()),
            pa.field("n_occ", pa.int64()),
        ]
    )

    parts = ds.select_columns([id_col, text_col]).map_batches(
        lambda t: chunk_rows(t, id_col, text_col, window, mask_bits, remainder),
        batch_format="pyarrow",
    ).materialize()
    n_rows = parts.count()
    if n_rows == 0:
        import ray.data as rd

        return rd.from_arrow(out_schema.empty_table())

    def merge_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        g = (
            pl.from_arrow(t)
            .group_by("chunk")
            .agg(
                [
                    pl.col(id_col).n_unique().alias("n_docs"),
                    pl.col("occ").sum().alias("n_occ"),
                ]
            )
            .filter(pl.col("n_occ") >= min_occ)
            .cast({"n_docs": pl.Int64, "n_occ": pl.Int64})
            .select(["chunk", "n_docs", "n_occ"])
        )
        return g.to_arrow().cast(out_schema)

    from textalyzer_ray.sources.tables import cluster_cpus

    groups = grouped_apply(
        parts,
        ["chunk"],
        merge_block,
        num_partitions=min(
            max(cluster_cpus(), 2), partitions_for(n_rows, 2_000_000)
        ),
    )
    return groups.sort("chunk")
