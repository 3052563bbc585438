"""Dedup stages: exact hash, MinHash/LSH, SimHash, winnowing.

Scale design (SURVEY.md §4, ray_guide "Aggregation at scale"):
- exact: content hash computed VECTORIZED per batch (polars xxhash-family
  ``hash``); the shuffle key is the 64-bit hash, not the document text,
  so the groupby moves 8 bytes per row + the kept representative. Hash
  collisions are resolved inside the group by comparing actual text.
- minhash: signatures per batch in an actor pool (permutation tables
  built once per actor), exploded to (band, band_hash, doc) rows; the
  ``groupby(band_key)`` shuffle moves fixed-width keys. Candidate pairs
  are verified with real shingle Jaccard before linking.
- simhash: 64-bit sketch per doc; near-dup = hamming <= t within
  bucketed prefixes.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from textalyzer_ray.core.fingerprint import (
    lsh_band_keys,
    minhash_params,
    minhash_signature,
    minhash_signature_from_hashes,
    simhash64,
    winnowed_fingerprints,
)
from textalyzer_ray.core.textmetrics import frequency_map, tokenize


def add_content_hash(
    batch: pa.Table, text_col: str = "text", out_col: str = "content_hash"
) -> pa.Table:
    """Vectorized deterministic 64-bit content hash (polars seed-0 hash;
    stable within a run across all workers — the cluster shares one
    polars version)."""
    df = pl.from_arrow(batch.select([text_col]))
    h = df.select(pl.col(text_col).hash(seed=0).alias(out_col))["" + out_col]
    return batch.append_column(out_col, pa.array(h.to_numpy(), pa.uint64()))


class MinHasher:
    """Actor-pool stage: append minhash LSH band keys per document.

    Emits one row per (doc x band): (id, band, band_hash) — the LSH
    explode. ``__init__`` builds the permutation tables once per actor.
    """

    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_perm: int = 128,
        shingle_k: int = 3,
        bands: int = 16,
        seed: int = 42,
    ):
        self.id_col = id_col
        self.text_col = text_col
        self.k = shingle_k
        self.bands = bands
        self.a, self.b = minhash_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_band, out_hash = [], [], []
        for i, t in zip(ids, texts):
            toks = tokenize(t or "")
            sig = minhash_signature(toks, self.k, self.a, self.b)
            for band, bh in lsh_band_keys(sig, self.bands):
                out_id.append(i)
                out_band.append(band)
                out_hash.append(bh)
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.uint64()),
            }
        )


class MinHashFeatures:
    """Per-document LSH features in ONE pass over the text — the
    scale-shaped replacement for shipping text through the band shuffle
    (VERDICT r1 #1). Emits one row per doc:

      (id, shingle_hashes: list<u64> unique-sorted, band_hash: list<u64>[bands])

    The shingle-hash array serves exact Jaccard verification downstream
    (``jaccard_from_hashes``); text never leaves this stage. Signature
    numerics are bit-identical to ``minhash_signature`` (same crc-pair
    base hashes, same permutations), so candidate buckets are unchanged
    vs the round-1 pipeline.
    """

    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_perm: int = 128,
        shingle_k: int = 3,
        bands: int = 16,
        seed: int = 42,
    ):
        self.id_col = id_col
        self.text_col = text_col
        self.k = shingle_k
        self.bands = bands
        self.a, self.b = minhash_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from textalyzer_ray.core.fingerprint import _shingle_hashes, shingles
        from textalyzer_ray.core.textmetrics import tokenize

        texts = batch[self.text_col].to_pylist()
        sh_offsets = [0]
        sh_values: list[np.ndarray] = []
        band_values = np.empty(len(texts) * self.bands, dtype=np.uint64)
        for row, t in enumerate(texts):
            base = _shingle_hashes(shingles(tokenize(t or ""), self.k))
            sig = minhash_signature_from_hashes(base, self.a, self.b)
            for band, bh in lsh_band_keys(sig, self.bands):
                band_values[row * self.bands + band] = bh
            uniq = np.unique(base)
            sh_values.append(uniq)
            sh_offsets.append(sh_offsets[-1] + len(uniq))
        flat = (
            np.concatenate(sh_values) if sh_values else np.empty(0, dtype=np.uint64)
        )
        shingle_col = pa.ListArray.from_arrays(
            pa.array(sh_offsets, pa.int32()), pa.array(flat, pa.uint64())
        )
        band_col = pa.ListArray.from_arrays(
            pa.array(range(0, len(band_values) + 1, self.bands), pa.int32()),
            pa.array(band_values, pa.uint64()),
        )
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "shingle_hashes": shingle_col,
                "band_hash": band_col,
            }
        )


class SimHasher:
    """Actor-pool stage: append a 64-bit simhash + a prefix bucket used
    to co-locate near-dup candidates (hamming neighbors usually share a
    16-bit prefix under small perturbations of low-weight tokens).

    ``hash_fn``: "stable" (blake2b, default) or "poly"
    (core.fingerprint.polyhash64 — SQL-recomputable, lets a DuckDB
    oracle verify the resulting pair set exactly)."""

    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        hash_fn: str = "stable",
    ):
        from textalyzer_ray.core.fingerprint import polyhash64, stable_hash_u64

        self.id_col = id_col
        self.text_col = text_col
        self.hash_fn = polyhash64 if hash_fn == "poly" else stable_hash_u64

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [
            simhash64(frequency_map(t or ""), self.hash_fn)
            for t in batch[self.text_col].to_pylist()
        ]
        arr = np.array(hashes, dtype=np.uint64)
        return (
            batch.select([self.id_col])
            .append_column("simhash", pa.array(arr, pa.uint64()))
            .append_column(
                "simhash_prefix", pa.array((arr >> np.uint64(48)).astype(np.uint16))
            )
        )


class Winnower:
    """Actor-pool stage: (id, fingerprint) rows via rolling-hash
    winnowing — substring-level document fingerprints."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text", k: int = 8, window: int = 4):
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, fps = [], []
        for i, t in zip(
            batch[self.id_col].to_pylist(), batch[self.text_col].to_pylist()
        ):
            for fp in winnowed_fingerprints(t or "", self.k, self.window):
                ids_out.append(i)
                fps.append(fp)
        return pa.table(
            {self.id_col: pa.array(ids_out), "fingerprint": pa.array(fps, pa.uint64())}
        )
