"""Bloom-filter incremental dedup — the probabilistic sibling of
``curation.dedup_against``.

``dedup_against`` is exact but pays a key-aligned shuffle of BOTH
corpora per crawl increment. At 10^10+ seen URLs the standard crawl
design is a Bloom filter instead: the seen-set compresses to a fixed
bit array (~1.2 GB per 10^9 keys at 10 bits/key), the probe side never
shuffles at all (one streaming map over the new crawl), and the cost is
a documented false-positive rate (a few per mille of NEW urls wrongly
skipped — acceptable for crawl frontier dedup, not for exact dedup,
which is why both operators exist).

Scale shape:
- **build**: per-block partial bitmaps (vectorized
  ``np.bitwise_or.at``), OR-merged. Below ``driver_merge_rows`` seen
  rows the per-block bitmaps come back to the driver and OR there (the
  measured-size small path); above it the bitmaps are split into fixed
  64 KiB chunks keyed by chunk index and OR-merged key-aligned
  (``grouped_apply``), so no single process ever holds
  blocks x m/8 bytes. The FINISHED filter is m/8 bytes by design —
  that is the broadcast budget, it lives in the object store once
  (``ray.put``) and every probe task reads it zero-copy.
- **probe**: one ``map_batches`` over the new crawl; per-worker object
  cache so the bitmap is fetched once per worker, not per batch.

Semantics (hash, probe positions, bit layout) live in
:mod:`textalyzer_ray.core.bloom` and are SQL-recomputable — the driver
oracle replays the filter bit-for-bit in DuckDB, false positives
included.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from textalyzer_ray.core.bloom import (
    bloom_maybe_contains,
    bloom_positions_array,
)

logger = logging.getLogger(__name__)

_CHUNK_BYTES = 65536


def bloom_build_distributed(
    seen: Dataset,
    key_col: str = "url",
    m_bits: int = 1 << 20,
    k: int = 7,
    driver_merge_rows: int = 2_000_000,
) -> np.ndarray:
    """Build the filter bitmap over ``seen[key_col]`` -> uint8 array of
    m_bits/8 bytes (driver-resident by design: it IS the broadcast
    model). Small path under ``driver_merge_rows`` seen rows; chunked
    key-aligned OR-merge above it."""
    if m_bits % (8 * _CHUNK_BYTES):
        raise ValueError("m_bits must be a multiple of 8 * 65536")
    n_seen = seen.count()
    nbytes = m_bits // 8

    def partial_chunks(t: pa.Table) -> pa.Table:
        bitmap = np.zeros(nbytes, dtype=np.uint8)
        keys = t[key_col].to_pylist()
        if keys:
            pos = bloom_positions_array(keys, m_bits, k).ravel()
            np.bitwise_or.at(
                bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
            )
        # sparse: emit only chunks that contain a set bit
        chunks, ids = [], []
        for ci in range(0, nbytes, _CHUNK_BYTES):
            chunk = bitmap[ci : ci + _CHUNK_BYTES]
            if chunk.any():
                ids.append(ci // _CHUNK_BYTES)
                chunks.append(chunk.tobytes())
        return pa.table(
            {
                "chunk_id": pa.array(ids, pa.int32()),
                "bits": pa.array(chunks, pa.binary()),
            }
        )

    partials = seen.map_batches(partial_chunks, batch_format="pyarrow")
    bitmap = np.zeros(nbytes, dtype=np.uint8)
    if n_seen <= driver_merge_rows:
        for b in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
            for cid, blob in zip(b["chunk_id"].to_pylist(), b["bits"].to_pylist()):
                off = cid * _CHUNK_BYTES
                np.bitwise_or(
                    bitmap[off : off + len(blob)],
                    np.frombuffer(blob, np.uint8),
                    out=bitmap[off : off + len(blob)],
                )
        return bitmap

    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    logger.info(
        "bloom_build: %d seen rows > driver_merge_rows=%d — chunked "
        "grouped OR-merge path",
        n_seen,
        driver_merge_rows,
    )

    def or_block(t: pa.Table) -> pa.Table:
        merged: dict[int, np.ndarray] = {}
        for cid, blob in zip(t["chunk_id"].to_pylist(), t["bits"].to_pylist()):
            arr = np.frombuffer(blob, np.uint8)
            if cid in merged:
                merged[cid] = merged[cid] | arr
            else:
                merged[cid] = arr
        return pa.table(
            {
                "chunk_id": pa.array(sorted(merged), pa.int32()),
                "bits": pa.array(
                    [merged[c].tobytes() for c in sorted(merged)], pa.binary()
                ),
            }
        )

    merged = grouped_apply(
        partials,
        ["chunk_id"],
        or_block,
        num_partitions=partitions_for(nbytes // _CHUNK_BYTES, rows_per_part=64),
    )
    for b in merged.iter_batches(batch_size=None, batch_format="pyarrow"):
        for cid, blob in zip(b["chunk_id"].to_pylist(), b["bits"].to_pylist()):
            off = cid * _CHUNK_BYTES
            bitmap[off : off + len(blob)] = np.frombuffer(blob, np.uint8)
    return bitmap


def bloom_flag_seen(
    ds: Dataset,
    bitmap: np.ndarray,
    key_col: str = "url",
    k: int = 7,
) -> Dataset:
    """Append ``maybe_seen`` (int64 0/1) per row of ``ds`` by probing
    the broadcast ``bitmap``. One streaming map; the filter ships via
    ``ray.put`` once and is cached per worker."""
    from textalyzer_ray.stages.groups import _worker_object_cache

    bm_ref = ray.put(bitmap)

    def probe(t: pa.Table) -> pa.Table:
        cache = _worker_object_cache()
        ck = "bloom_" + bm_ref.hex()
        bm = cache.get(ck)
        if bm is None:
            bm = cache[ck] = ray.get(bm_ref)
        flags = bloom_maybe_contains(bm, t[key_col].to_pylist(), k)
        return t.append_column(
            "maybe_seen", pa.array(flags.astype(np.int64), pa.int64())
        )

    return ds.map_batches(probe, batch_format="pyarrow")


def bloom_dedup_against(
    ds: Dataset,
    seen: Dataset,
    key_col: str = "url",
    m_bits: int = 1 << 20,
    k: int = 7,
    driver_merge_rows: int = 2_000_000,
) -> Dataset:
    """Probabilistic incremental dedup: flag every row of ``ds`` whose
    key is maybe-present in ``seen`` (false positives possible at the
    configured m/k; false negatives impossible). Filter ``maybe_seen ==
    0`` for the definitely-new rows."""
    bitmap = bloom_build_distributed(
        seen, key_col=key_col, m_bits=m_bits, k=k,
        driver_merge_rows=driver_merge_rows,
    )
    return bloom_flag_seen(ds, bitmap, key_col=key_col, k=k)
