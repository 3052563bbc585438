"""Similarity-search stages over an embedding column (list<float>).

- ``BruteForceTopK``: the exact baseline — the query matrix is broadcast
  ONCE via ``ray.put`` on the driver; each actor fetches it once in
  ``__init__`` (not per batch) and does a numpy matmul per batch,
  emitting that batch's local top-k. A tiny driver-side (or groupby)
  merge reduces local top-ks to the global answer: the shuffle carries
  k rows per batch, never the corpus.
- ``IvfAssigner``: the scale path — assign each vector to its nearest of
  C centroids (deterministic farthest-point init + a few Lloyd rounds on
  a sample); querying probes only the closest cells.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _stack_embeddings(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // max(len(arr), 1)
    return flat.reshape(len(arr), dim)


def normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """Per-batch exact cosine top-k against a broadcast query matrix.

    ``queries_ref`` is a ``ray.put`` ObjectRef of (q, dim) float64 —
    fetched once per actor. Emits (query_idx, id, cosine) local top-k
    rows per batch; merge with a global sort+limit or driver reduce.
    """

    def __init__(
        self,
        queries_ref,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        k: int = 10,
    ):
        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = normalize_rows(np.asarray(q, dtype=np.float64))
        self.id_col = id_col
        self.emb_col = emb_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        m = normalize_rows(_stack_embeddings(batch, self.emb_col))
        sims = self.q @ m.T  # (q, n)
        k = min(self.k, sims.shape[1])
        out_q, out_id, out_cos = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = np.argpartition(-row, k - 1)[:k]
            for j in top:
                out_q.append(qi)
                out_id.append(ids[j])
                out_cos.append(row[j])
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int32()),
                self.id_col: pa.array(out_id),
                "cosine": pa.array(out_cos, pa.float64()),
            }
        )


def deterministic_centroids(sample: np.ndarray, n_centroids: int, iters: int = 5) -> np.ndarray:
    """Farthest-point init (start at index 0) + ``iters`` Lloyd rounds.
    Fully deterministic for a fixed sample order."""
    sample = normalize_rows(np.asarray(sample, dtype=np.float64))
    chosen = [0]
    d = 1.0 - sample @ sample[0]
    for _ in range(1, n_centroids):
        nxt = int(np.argmax(d))
        chosen.append(nxt)
        d = np.minimum(d, 1.0 - sample @ sample[nxt])
    cents = sample[chosen].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


class IvfAssigner:
    """Append ``ivf_cell:int32`` — nearest centroid id. With
    ``n_assign > 1``, ROWS ARE REPLICATED once per assigned cell
    (multi-assignment: the standard fix for boundary recall loss in
    cell-local pair mining) and ``ivf_cells:list<int32>`` carries the
    full sorted assignment so downstream stages can dedupe pairs by
    first-common-cell. Centroids are broadcast once via ray.put and
    fetched per actor."""

    def __init__(self, centroids_ref, emb_col: str = "embedding", n_assign: int = 1):
        c = ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray) else centroids_ref
        self.cents = normalize_rows(np.asarray(c, dtype=np.float64))
        self.emb_col = emb_col
        self.n_assign = n_assign

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = normalize_rows(_stack_embeddings(batch, self.emb_col))
        sims = m @ self.cents.T
        if self.n_assign <= 1:
            cells = np.argmax(sims, axis=1).astype(np.int32)
            return batch.append_column("ivf_cell", pa.array(cells, pa.int32()))
        k = min(self.n_assign, sims.shape[1])
        # top-k cells per row, sorted ascending so the first COMMON cell
        # of any two rows is well defined for downstream pair dedup
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k].astype(np.int32)
        top = np.sort(top, axis=1)
        n = len(top)
        out = batch.take(pa.array(np.repeat(np.arange(n), k)))
        out = out.append_column("ivf_cell", pa.array(top.reshape(-1), pa.int32()))
        # each replicated row carries the SAME full assignment list
        rep_lists = pa.ListArray.from_arrays(
            pa.array(range(0, n * k * k + 1, k), pa.int32()),
            pa.array(np.repeat(top, k, axis=0).reshape(-1), pa.int32()),
        )
        return out.append_column("ivf_cells", rep_lists)
