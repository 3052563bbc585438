"""Sorted-neighborhood near-duplicate blocking (SNM — Hernandez &
Stolfo SIGMOD'95, the record-linkage classic): sort the corpus by a
cheap blocking key, compare every row only against its ``window - 1``
predecessors in the sorted order, verify candidates with exact
shingle Jaccard. Complements the recall-1 joins (setjoin/editsim) and
the probabilistic sketches (minhash/simhash): SNM's candidate volume
is EXACTLY ``n x (window-1)`` — fixed, skew-proof, and independent of
how duplicated the corpus is, which is what you want as a bounded-cost
first pass over a crawl of unknown duplication structure.

Shape (one all-to-all, zero joins):

1. featurize — (id, klen = byte length, shingle-hash blob) per doc;
   the blob (u64 LE bytes) rides the sort as a binary payload (list<>
   columns never ride a shuffle — CLAUDE.md r2).
2. ONE ``Dataset.sort`` by (klen, id) — the algorithm's all-to-all —
   then materialize so the two downstream passes reuse the sorted
   blocks instead of re-running the sort.
3. a metadata pass collects each sorted block's head key, row count
   and last ``window - 1`` rows (blocks x (window-1) rows — driver
   bounded); the driver walks blocks in key order keeping a rolling
   (window-1)-row buffer, producing each block's CARRY-IN: the rows
   immediately preceding it in GLOBAL order. Broadcast via ``ray.put``
   + the per-worker object cache.
4. the pairs pass prepends each block's carry-in and slides the
   window; a pair is emitted by the block owning its SECOND element
   (emit-once by construction). A vectorized size-ratio prefilter
   (min/max shingle-set sizes >= threshold, necessary for Jaccard >=
   threshold) prunes before the exact per-pair verification.

Window pairing is purely positional, so no global rank is ever
computed or shuffled. Oracle: row_number() over the same key order +
a rank-distance band self-join + exact candidate-restricted shingle
Jaccard (int/int division is IEEE-identical — CLAUDE.md r2)."""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
from ray.data import Dataset

logger = logging.getLogger(__name__)

_PAIR_SCHEMA = pa.schema(
    [
        pa.field("id_a", pa.int64()),
        pa.field("id_b", pa.int64()),
        pa.field("jaccard", pa.float64()),
    ]
)


def sorted_neighborhood_pairs(
    ds: Dataset,
    window: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_guard_rows: int = 2_000_000,
    carry_guard_bytes: int = 1 << 30,
) -> Dataset:
    """(id_a, id_b, jaccard) with id_a < id_b: every pair within
    ``window`` positions of each other under the (byte-length, id)
    sort whose exact ``shingle_k``-gram Jaccard >= ``threshold``.
    The driver-side carry metadata (blocks x (window-1) rows incl.
    shingle blobs) is measured and refused above ``carry_guard_rows``
    / ``carry_guard_bytes``."""
    import ray
    import pyarrow.compute as pc

    from textalyzer_ray.core.fingerprint import (
        jaccard_from_hashes,
        shingle_hash_set,
    )
    from textalyzer_ray.core.textmetrics import tokenize
    from textalyzer_ray.stages.groups import _worker_object_cache

    if window < 2:
        raise ValueError("window must be >= 2")
    w1 = window - 1

    feat_schema = pa.schema(
        [
            pa.field("klen", pa.int64()),
            pa.field("id", pa.int64()),
            pa.field("blob", pa.binary()),
        ]
    )

    def featurize(t: pa.Table) -> pa.Table:
        blobs = [
            shingle_hash_set(tokenize(txt or ""), shingle_k).tobytes()
            for txt in t[text_col].to_pylist()
        ]
        return pa.table(
            {
                "klen": pc.cast(pc.binary_length(t[text_col]), pa.int64()),
                "id": pc.cast(t[id_col], pa.int64()),
                "blob": pa.array(blobs, pa.binary()),
            },
            schema=feat_schema,
        )

    feats = (
        ds.select_columns([id_col, text_col])
        .map_batches(featurize, batch_format="pyarrow")
        .sort(["klen", "id"])
        .materialize()
    )

    meta_schema = pa.schema(
        [
            pa.field("h_klen", pa.int64()),
            pa.field("h_id", pa.int64()),
            pa.field("n", pa.int64()),
            pa.field("klen", pa.int64()),
            pa.field("id", pa.int64()),
            pa.field("blob", pa.binary()),
        ]
    )

    def block_meta(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return meta_schema.empty_table()
        tail = t.slice(max(0, t.num_rows - w1))
        k = tail.num_rows
        return pa.table(
            {
                "h_klen": pa.array([t["klen"][0].as_py()] * k, pa.int64()),
                "h_id": pa.array([t["id"][0].as_py()] * k, pa.int64()),
                "n": pa.array([t.num_rows] * k, pa.int64()),
                "klen": tail["klen"],
                "id": tail["id"],
                "blob": tail["blob"],
            },
            schema=meta_schema,
        )

    # driver-bounded: blocks x (window-1) rows — MEASURED before they
    # land on the driver (the repo-wide measured-size-guard pattern):
    # at web scale (~800k blocks x w1 incl. shingle blobs) an unbounded
    # take_all is a few-GB driver dict, so refuse loudly above the
    # guard instead of silently degrading the driver
    meta_ds = feats.map_batches(
        block_meta, batch_format="pyarrow", batch_size=None
    ).materialize()
    n_meta = meta_ds.count()
    meta_bytes = meta_ds.size_bytes() or 0
    if n_meta > carry_guard_rows or meta_bytes > carry_guard_bytes:
        raise ValueError(
            f"sorted_neighborhood_pairs: carry metadata ({n_meta} rows, "
            f"{meta_bytes} bytes) exceeds the driver guard "
            f"({carry_guard_rows} rows / {carry_guard_bytes} bytes) — "
            "raise the guard explicitly or shrink window / grow block "
            "size; the carry walk is sequential in key order by design "
            "(Hernandez-Stolfo), so past this size run SNM per key range"
        )
    logger.info(
        "sorted_neighborhood_pairs: driver carry %d rows, %d bytes",
        n_meta,
        meta_bytes,
    )
    meta_rows = meta_ds.take_all()
    blocks: dict[tuple[int, int], list] = {}
    for r in meta_rows:
        blocks.setdefault((r["h_klen"], r["h_id"]), []).append(r)
    carry_map: dict[tuple[int, int], list[tuple[int, int, bytes]]] = {}
    rolling: list[tuple[int, int, bytes]] = []
    for head in sorted(blocks):
        rows = sorted(blocks[head], key=lambda r: (r["klen"], r["id"]))
        carry_map[head] = list(rolling)
        tail = [(r["klen"], r["id"], r["blob"]) for r in rows]
        if rows[0]["n"] >= w1:
            rolling = tail
        else:
            rolling = (rolling + tail)[-w1:]
    carry_ref = ray.put(carry_map)

    def pairs_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        cache = _worker_object_cache()
        if carry_ref not in cache:
            cache[carry_ref] = ray.get(carry_ref)
        carry = cache[carry_ref].get(
            (t["klen"][0].as_py(), t["id"][0].as_py()), []
        )
        c = len(carry)
        ids = np.concatenate(
            [
                np.array([r[1] for r in carry], dtype=np.int64),
                t["id"].to_numpy(zero_copy_only=False),
            ]
        )
        blobs = [r[2] for r in carry] + t["blob"].to_pylist()
        sizes = np.array([len(b) // 8 for b in blobs], dtype=np.int64)
        n = len(ids)
        out_a: list[int] = []
        out_b: list[int] = []
        out_j: list[float] = []
        for d in range(1, w1 + 1):
            lo = max(0, c - d)
            if lo + d >= n:
                continue
            i = np.arange(lo, n - d)
            j = i + d
            # necessary condition for Jaccard >= threshold
            mn = np.minimum(sizes[i], sizes[j])
            mx = np.maximum(sizes[i], sizes[j]).clip(min=1)
            ok = mn >= threshold * mx
            for x, y in zip(i[ok].tolist(), j[ok].tolist()):
                va = np.frombuffer(blobs[x], dtype=np.uint64)
                vb = np.frombuffer(blobs[y], dtype=np.uint64)
                jac = jaccard_from_hashes(va, vb)
                if jac >= threshold:
                    a, b = int(ids[x]), int(ids[y])
                    if a > b:
                        a, b = b, a
                    out_a.append(a)
                    out_b.append(b)
                    out_j.append(jac)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            },
            schema=_PAIR_SCHEMA,
        )

    return feats.map_batches(
        pairs_block, batch_format="pyarrow", batch_size=None
    )
