"""Byte-level ExactSubstr duplicate spans (Lee et al., ACL 2022) —
the exact upgrade of the token-5-gram approximation in
``curation.dup_span_removal``: every byte position inside a substring
of length >= ``min_len`` occurring >= 2 times in the corpus (cross-doc
OR self-repeat — the paper counts any second occurrence) is
duplicated; output = maximal merged duplicated byte spans per doc,
``(doc_id, span_start, span_end)`` half-open byte offsets.

The reference algorithm builds a corpus suffix array. The coverage
lemma makes the same OUTPUT Ray-Data-expressible without one: a
position is covered by a duplicated substring of length >= L iff it is
covered by a duplicated substring of length EXACTLY L (any >=L
occurrence contains an L-window covering the position; any duplicated
L-window is itself a duplicated substring), so L-window occurrence
counting over key-aligned exchanges reproduces the suffix-array
answer. The suffix-array form survives as the pinned test oracle
(core/exactsubstr.py ``reference_spans``).

Exactness without SQL-replayable hashing: window keys travel as the
64-bit invertible rolling hash (core/exactsubstr.py — recall 1 since
equal bytes give equal hashes), then a VERIFY exchange groups the
candidate windows by their ACTUAL bytes so a hash collision can never
mark a unique window (precision 1). All integers; the DuckDB oracle is
plain substr + GROUP BY + gaps-and-islands.

Scale shape:

- pass A: per-block rolling hashes (one cumsum + two cumprods per
  batch, O(bytes), zero per-position Python) -> ``key_counts`` (its
  in-block partial collapses the position stream before the exchange;
  tree/key-aligned merge auto-switches on measured rows) -> hashes
  with count >= 2, MEASURED.
- pass B small dup set (<= ``broadcast_threshold``): broadcast the
  sorted dup hashes (searchsorted membership per batch), slice the
  candidate window bytes in the same pass — no extra shuffle.
- pass B large: position rows take ONE union-tag exchange against the
  dup-hash table (joins.union_tag_lookup, join-free), then ONE
  doc-aligned union-tag exchange against the texts to slice window
  bytes (the dup_span_removal distributed-rebuild precedent).
- verify: candidates exchange ONCE hash-aligned; per-block group by
  window BYTES keeps only true >= 2 contents (each hash block holds
  every occurrence of its contents, so block-local counts are global).
- spans: kept starts exchange ONCE doc-aligned; vectorized interval
  merge (same-length intervals: break where start > prev_start + L).

Every exchange is sized from measured row counts (partitions_for).
Consumes ``ds`` twice (three times on the large path) — pass a
parquet-backed or materialized dataset.

Reference analogue: none (the reference's duplication is exact line
groups, textalyzer/src/duplication.rs); §2.9 LLM-pipeline extension.
"""

from __future__ import annotations

import logging

import numpy as np
import polars as pl
import pyarrow as pa
from ray.data import Dataset

from textalyzer_ray.core.exactsubstr import window_hashes

logger = logging.getLogger(__name__)

_SPAN_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("span_start", pa.int64()),
        pa.field("span_end", pa.int64()),
    ]
)


def _batch_windows(
    t: pa.Table, id_col: str, text_col: str, min_len: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(ids, local_pos, hashes, data, gpos) for every min_len-byte
    window of the batch: one vectorized pass over the concatenated
    string buffer (ids/pos via the repeat+cumsum explode, hashes via
    the rolling prefix trick). ``data`` is the batch's flat byte
    buffer, ``gpos`` the windows' global start offsets into it —
    callers slice only the windows they keep."""
    import pyarrow.compute as pc

    from textalyzer_ray.pipelines.editsim import _str_buffers

    col = t[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    off, data = _str_buffers(col)
    lens = off[1:] - off[:-1]
    n = len(lens)
    npos = np.maximum(lens - min_len + 1, 0)
    total = int(npos.sum())
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if total == 0:
        e = np.empty(0, np.int64)
        return e, e, np.empty(0, np.uint64), data, e
    rowrep = np.repeat(np.arange(n, dtype=np.int64), npos)
    cum = np.zeros(n + 1, np.int64)
    np.cumsum(npos, out=cum[1:])
    local = np.arange(total, dtype=np.int64) - cum[rowrep]
    gpos = off[:-1][rowrep] + local
    h = window_hashes(data, gpos, min_len)
    return ids[rowrep], local, h, data, gpos


def _win_binary(win_mat: np.ndarray, min_len: int) -> pa.Array:
    """(k, min_len) uint8 matrix -> fixed-width binary array."""
    k = len(win_mat)
    return pa.Array.from_buffers(
        pa.binary(min_len), k, [None, pa.py_buffer(win_mat.tobytes())]
    )


def exact_substr_spans(
    ds: Dataset,
    min_len: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_threshold: int = 2_000_000,
) -> Dataset:
    """(doc_id, span_start, span_end), sorted — maximal byte spans of
    each doc covered by some >= ``min_len``-byte substring occurring
    >= 2 times in the corpus. Byte offsets, half-open. ``id_col`` must
    be unique int64-castable."""
    import ray.data as rd

    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    kept, n_kept = _dup_window_starts(
        ds, min_len, id_col, text_col, broadcast_threshold
    )
    if kept is None:
        return rd.from_arrow(_SPAN_SCHEMA.empty_table())

    # --- spans: doc-aligned interval merge (fixed-length intervals)
    def spans_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SPAN_SCHEMA.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, ids))
        ids, pos = ids[order], pos[order]
        brk = np.r_[
            True, (ids[1:] != ids[:-1]) | (pos[1:] > pos[:-1] + min_len)
        ]
        first = np.flatnonzero(brk)
        last = np.r_[first[1:] - 1, len(pos) - 1]
        return pa.table(
            {
                "doc_id": pa.array(ids[first]),
                "span_start": pa.array(pos[first]),
                "span_end": pa.array(pos[last] + min_len),
            },
            schema=_SPAN_SCHEMA,
        )

    return grouped_apply(
        kept,
        ["doc_id"],
        spans_block,
        num_partitions=partitions_for(n_kept, 4_000_000),
    ).sort(["doc_id", "span_start"])


def _dup_window_starts(
    ds: Dataset,
    min_len: int,
    id_col: str,
    text_col: str,
    broadcast_threshold: int,
) -> tuple[Dataset | None, int]:
    """The shared ExactSubstr core: (materialized Dataset[(doc_id,
    pos)] of VERIFIED duplicated window starts, its row count), or
    (None, 0) when the corpus has no duplicated window. See the module
    docstring for the pass structure."""
    import pyarrow.compute as pc
    import ray

    from textalyzer_ray.stages.groups import (
        _worker_object_cache,
        grouped_apply,
        key_counts,
        partitions_for,
    )

    if min_len < 2:
        raise ValueError("min_len must be >= 2")

    # --- pass A: global window-hash counts, dup set measured ---
    def explode_h(t: pa.Table) -> pa.Table:
        h = _batch_windows(t, id_col, text_col, min_len)[2]
        return pa.table({"h": pa.array(h, pa.uint64())})

    counts = key_counts(
        ds.map_batches(explode_h, batch_format="pyarrow"), ["h"]
    )
    dup_ds = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["count"], 2)),
        batch_format="pyarrow",
    ).materialize()
    n_dup = dup_ds.count()
    logger.info("exact_substr: %d duplicated window hashes", n_dup)
    if n_dup == 0:
        return None, 0

    cand_schema = pa.schema(
        [
            pa.field("h", pa.uint64()),
            pa.field("doc_id", pa.int64()),
            pa.field("pos", pa.int64()),
            pa.field("win", pa.binary(min_len)),
        ]
    )

    if n_dup <= broadcast_threshold:
        dup_h = np.sort(
            np.concatenate(
                [
                    b["h"].to_numpy(zero_copy_only=False)
                    for b in dup_ds.iter_batches(
                        batch_size=None, batch_format="pyarrow"
                    )
                ]
            )
        )
        dup_ref = ray.put(dup_h)

        def cand_broadcast(t: pa.Table) -> pa.Table:
            cache = _worker_object_cache()
            ck = dup_ref.hex()
            arr = cache.get(ck)
            if arr is None:
                arr = cache[ck] = ray.get(dup_ref)
            ids, pos, h, data, gpos = _batch_windows(
                t, id_col, text_col, min_len
            )
            ix = np.minimum(np.searchsorted(arr, h), max(len(arr) - 1, 0))
            mem = arr[ix] == h if len(arr) else np.zeros(len(h), bool)
            wins = data[gpos[mem][:, None] + np.arange(min_len)]
            return pa.table(
                {
                    "h": pa.array(h[mem]),
                    "doc_id": pa.array(ids[mem]),
                    "pos": pa.array(pos[mem]),
                    "win": _win_binary(wins, min_len),
                },
                schema=cand_schema,
            )

        cands = ds.map_batches(
            cand_broadcast, batch_format="pyarrow"
        ).materialize()
    else:
        cands = _cands_distributed(
            ds, dup_ds, n_dup, min_len, id_col, text_col, cand_schema
        ).materialize()
    n_cand = cands.count()
    logger.info("exact_substr: %d candidate windows", n_cand)
    if n_cand == 0:
        return None, 0

    # --- verify: group candidates by ACTUAL bytes inside hash blocks
    kept_schema = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("pos", pa.int64())]
    )

    def verify_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return kept_schema.empty_table()
        df = pl.from_arrow(t)
        keep = df.filter(pl.len().over("win") >= 2)
        return keep.select(["doc_id", "pos"]).to_arrow().cast(kept_schema)

    kept = grouped_apply(
        cands,
        ["h"],
        verify_block,
        num_partitions=partitions_for(n_cand, 2_000_000),
    ).materialize()
    n_kept = kept.count()
    if n_kept == 0:
        return None, 0
    return kept, n_kept


def _cands_distributed(
    ds: Dataset,
    dup_ds: Dataset,
    n_dup: int,
    min_len: int,
    id_col: str,
    text_col: str,
    cand_schema: pa.Schema,
) -> Dataset:
    """Large-dup-set candidate path: (h, doc_id, pos) position rows
    filter through ONE union-tag hash exchange against the dup table,
    then ONE doc-aligned union-tag exchange against the texts slices
    the window bytes (grouped_apply — join-free, the dup_span_removal
    rebuild precedent)."""
    from textalyzer_ray.pipelines.joins import union_tag_lookup
    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    def pos_rows(t: pa.Table) -> pa.Table:
        ids, pos, h, _, _ = _batch_windows(t, id_col, text_col, min_len)
        return pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                "doc_id": pa.array(ids),
                "pos": pa.array(pos),
            }
        )

    cand_pos = union_tag_lookup(
        ds.map_batches(pos_rows, batch_format="pyarrow"),
        dup_ds,
        "h",
        "count",
        "dup_c",
        num_partitions=partitions_for(n_dup, 2_000_000),
    ).drop_columns(["dup_c"])

    # union-tag texts + candidate rows into one doc-aligned exchange
    tag_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("pos", pa.int64()),
            pa.field("h", pa.uint64()),
            pa.field(text_col, pa.string()),
            pa.field("__side", pa.int8()),
        ]
    )

    def tag_cand(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pos": t["pos"],
                "h": t["h"],
                text_col: pa.nulls(n, pa.string()),
                "__side": pa.array(np.zeros(n, np.int8)),
            },
            schema=tag_schema,
        )

    def tag_text(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.num_rows
        return pa.table(
            {
                "doc_id": pc.cast(t[id_col], pa.int64()),
                "pos": pa.nulls(n, pa.int64()),
                "h": pa.nulls(n, pa.uint64()),
                text_col: pc.cast(t[text_col], pa.string()),
                "__side": pa.array(np.ones(n, np.int8)),
            },
            schema=tag_schema,
        )

    tagged = ds.select_columns([id_col, text_col]).map_batches(
        tag_text, batch_format="pyarrow"
    ).union(cand_pos.map_batches(tag_cand, batch_format="pyarrow"))
    # the union captures the TEXT branch's context, but the candidate
    # branch embeds union_tag_lookup's keyed repartition — scope the
    # hash strategy to the union's own lineage (CLAUDE.md r3: per-
    # pipeline, never session-wide)
    from ray.data.context import ShuffleStrategy

    tagged.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE

    def slice_block(t: pa.Table) -> pa.Table:
        from textalyzer_ray.pipelines.editsim import _str_buffers

        if t.num_rows == 0:
            return cand_schema.empty_table()
        side = t["__side"].to_numpy(zero_copy_only=False)
        cand = t.filter(pa.array(side == 0))
        texts = t.filter(pa.array(side == 1))
        if cand.num_rows == 0 or texts.num_rows == 0:
            return cand_schema.empty_table()
        tcol = texts[text_col]
        tcol = tcol.combine_chunks() if isinstance(tcol, pa.ChunkedArray) else tcol
        off, data = _str_buffers(tcol)
        tids = texts["doc_id"].to_numpy(zero_copy_only=False)
        t_order = np.argsort(tids, kind="stable")
        tids_s = tids[t_order]
        cids = cand["doc_id"].to_numpy(zero_copy_only=False)
        pos = cand["pos"].to_numpy(zero_copy_only=False)
        tix = t_order[np.searchsorted(tids_s, cids)]
        gpos = off[:-1][tix] + pos
        wins = data[gpos[:, None] + np.arange(min_len)]
        return pa.table(
            {
                "h": cand["h"],
                "doc_id": cand["doc_id"],
                "pos": cand["pos"],
                "win": _win_binary(wins, min_len),
            },
            schema=cand_schema,
        )

    tagged = tagged.materialize()
    return grouped_apply(
        tagged,
        ["doc_id"],
        slice_block,
        num_partitions=partitions_for(tagged.count(), 2_000_000),
    )


_REMOVAL_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("n_bytes", pa.int64()),
        pa.field("removed_bytes", pa.int64()),
        pa.field("kept_text", pa.string()),
    ]
)


def exact_substr_removal(
    ds: Dataset,
    min_len: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_threshold: int = 2_000_000,
) -> Dataset:
    """(doc_id, n_bytes, removed_bytes, kept_text), sorted — the
    ACTION to ``exact_substr_spans``'s signal, i.e. what Lee et al.
    2022 apply to the training corpus: every byte inside a duplicated
    >= ``min_len``-byte substring is cut and the document is rebuilt
    from the surviving bytes in order ('' when everything was
    removed). String-equal in SQL (substr segment concat), so the
    oracle gates the rebuild itself, not just counts.

    One extra doc-aligned exchange beyond the shared core: texts and
    verified window starts union-tag by doc (the dup_span_removal
    rebuild precedent); the per-block rebuild is a single diff-array
    coverage cumsum over the block's concatenated byte buffer + one
    masked gather — no per-doc Python slicing."""
    import pyarrow.compute as pc

    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    def passthrough(t: pa.Table) -> pa.Table:
        col = pc.fill_null(t[text_col], "").cast(pa.string())
        return pa.table(
            {
                "doc_id": pc.cast(t[id_col], pa.int64()),
                "n_bytes": pc.cast(pc.binary_length(col), pa.int64()),
                "removed_bytes": pa.array(
                    np.zeros(t.num_rows, np.int64)
                ),
                "kept_text": col,
            },
            schema=_REMOVAL_SCHEMA,
        )

    kept, n_kept = _dup_window_starts(
        ds, min_len, id_col, text_col, broadcast_threshold
    )
    if kept is None:
        return ds.select_columns([id_col, text_col]).map_batches(
            passthrough, batch_format="pyarrow"
        ).sort(["doc_id"])

    tag_schema = pa.schema(
        [
            pa.field("doc_id", pa.int64()),
            pa.field("pos", pa.int64()),
            pa.field(text_col, pa.string()),
            pa.field("__side", pa.int8()),
        ]
    )

    def tag_start(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pos": t["pos"],
                text_col: pa.nulls(n, pa.string()),
                "__side": pa.array(np.zeros(n, np.int8)),
            },
            schema=tag_schema,
        )

    def tag_text(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "doc_id": pc.cast(t[id_col], pa.int64()),
                "pos": pa.nulls(n, pa.int64()),
                text_col: pc.cast(pc.fill_null(t[text_col], ""), pa.string()),
                "__side": pa.array(np.ones(n, np.int8)),
            },
            schema=tag_schema,
        )

    tagged = (
        ds.select_columns([id_col, text_col])
        .map_batches(tag_text, batch_format="pyarrow")
        .union(kept.map_batches(tag_start, batch_format="pyarrow"))
    )
    # scope the hash strategy to the union's lineage (CLAUDE.md r3)
    from ray.data.context import ShuffleStrategy

    tagged.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    tagged = tagged.materialize()

    def rebuild_block(t: pa.Table) -> pa.Table:
        from textalyzer_ray.pipelines.editsim import _str_buffers

        if t.num_rows == 0:
            return _REMOVAL_SCHEMA.empty_table()
        side = t["__side"].to_numpy(zero_copy_only=False)
        texts = t.filter(pa.array(side == 1))
        starts = t.filter(pa.array(side == 0))
        if texts.num_rows == 0:
            return _REMOVAL_SCHEMA.empty_table()
        tids = texts["doc_id"].to_numpy(zero_copy_only=False)
        t_order = np.argsort(tids, kind="stable")
        texts = texts.take(pa.array(t_order, pa.int64()))
        tids = tids[t_order]
        tcol = texts[text_col]
        tcol = (
            tcol.combine_chunks() if isinstance(tcol, pa.ChunkedArray) else tcol
        )
        off, data = _str_buffers(tcol)
        lens = off[1:] - off[:-1]
        total = int(off[-1]) - int(off[0])
        base = int(off[0])
        diff = np.zeros(total + 1, np.int32)
        if starts.num_rows:
            sids = starts["doc_id"].to_numpy(zero_copy_only=False)
            pos = starts["pos"].to_numpy(zero_copy_only=False)
            tix = np.searchsorted(tids, sids)
            a = off[:-1][tix] - base + pos
            np.add.at(diff, a, 1)
            np.add.at(diff, a + min_len, -1)
        cov = np.cumsum(diff[:-1]) > 0
        csum = np.zeros(total + 1, np.int64)
        np.cumsum(cov, out=csum[1:])
        o = off - base
        removed = csum[o[1:]] - csum[o[:-1]]
        kept_bytes = data[base : base + total][~cov]
        new_off = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens - removed, out=new_off[1:])
        kept_text = pa.Array.from_buffers(
            pa.string(),
            len(lens),
            [
                None,
                pa.py_buffer(new_off.astype(np.int32).tobytes()),
                pa.py_buffer(kept_bytes.tobytes()),
            ],
        )
        return pa.table(
            {
                "doc_id": pa.array(tids),
                "n_bytes": pa.array(lens),
                "removed_bytes": pa.array(removed),
                "kept_text": kept_text,
            },
            schema=_REMOVAL_SCHEMA,
        )

    return grouped_apply(
        tagged,
        ["doc_id"],
        rebuild_block,
        num_partitions=partitions_for(tagged.count(), 2_000_000),
    ).sort(["doc_id"])
