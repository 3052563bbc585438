"""Sharded incremental IVF vector index — the embedding sibling of
``state/lsh_index.py``.

Batch ANN (``pipelines/similarity.py``) rescans the corpus per query
set; a retrieval/dedup ingest loop instead wants vectors INDEXED once
and probed many times as new waves arrive. That persistent, growing,
cell-sharded store is shared mutable state, so the postings live in raw
Ray actors while featurization/probing stay in ``map_batches`` task
pools.

Layout: centroids are fit ONCE from the deterministic smallest-id
sample (``pipelines.similarity.build_centroids`` — stable sample =>
stable cells => resumable/reproducible index) and broadcast; each
``_CellShard`` actor owns the vectors of cells with
``cell % n_shards == s`` (append-only numpy buffers per cell). A top-k
probe ships the normalized query matrix to the shards owning the
probed cells; each shard answers its local top-k (one BLAS matmul over
the concatenated probed cells), and the querying task merges
shard-local heaps — exactly the IVF-probe dataflow of a distributed
vector database.

Exactness: with ``n_probe = n_centroids`` the probe covers every cell,
so results equal brute-force cosine top-k — the driver-gate setting
(rank-gap margins measured and pytest-pinned, the knn_graph pattern).
Smaller ``n_probe`` trades recall for probe volume; tests measure
recall explicitly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset


@ray.remote(num_cpus=0)
class _CellShard:
    """cell -> (ids int64, vectors float64[ , dim]) append-only store."""

    def __init__(self) -> None:
        self._ids: dict[int, list[np.ndarray]] = {}
        self._mats: dict[int, list[np.ndarray]] = {}

    def add(self, cells: np.ndarray, ids: np.ndarray, mat: np.ndarray) -> int:
        for c in np.unique(cells):
            m = cells == c
            self._ids.setdefault(int(c), []).append(ids[m])
            self._mats.setdefault(int(c), []).append(mat[m])
        return len(ids)

    def topk(
        self, wanted: np.ndarray, probes: np.ndarray, q: np.ndarray, k: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Local top-k per query over this shard's slice of the probed
        cells. ``wanted``: the union of probed cells owned by this
        shard; ``probes``: (n_q, n_probe) per-query probe cells (a
        query only scores vectors in ITS probed cells); ``q``:
        normalized (n_q, dim). Returns (query_row, vec_id, sim)."""
        own = [c for c in wanted.tolist() if c in self._ids]
        if not own:
            e = np.empty(0)
            return e.astype(np.int64), e.astype(np.int64), e
        ids = np.concatenate([a for c in own for a in self._ids[c]])
        mat = np.vstack([a for c in own for a in self._mats[c]])
        cells = np.concatenate(
            [
                np.full(sum(len(a) for a in self._ids[c]), c, dtype=np.int64)
                for c in own
            ]
        )
        sims = q @ mat.T  # (n_q, n_vecs)
        out_q: list[np.ndarray] = []
        out_i: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for qi in range(q.shape[0]):
            mask = np.isin(cells, probes[qi])
            if not mask.any():
                continue
            s = sims[qi][mask]
            vids = ids[mask]
            if len(s) > k:
                part = np.argpartition(-s, k - 1)[:k]
                # exact tie handling happens at the merge; the partition
                # only needs to keep every candidate that could make the
                # global top-k, which any k-subset of max values does —
                # ties AT the cut are resolved by the merge's stable
                # (sim desc, id asc) order over all shard candidates
                kth = s[part].min()
                wide = s >= kth  # keep all tied-at-cut candidates
                s, vids = s[wide], vids[wide]
            out_q.append(np.full(len(s), qi, dtype=np.int64))
            out_i.append(vids.astype(np.int64))
            out_s.append(s)
        if not out_q:
            e = np.empty(0)
            return e.astype(np.int64), e.astype(np.int64), e
        return (
            np.concatenate(out_q),
            np.concatenate(out_i),
            np.concatenate(out_s),
        )

    def n_vectors(self) -> int:
        return sum(
            sum(len(a) for a in lst) for lst in self._ids.values()
        )

    def save(self, path: str) -> int:
        """Persist this shard as one parquet file: (cell, vec_id,
        vector-bytes) rows — each shard checkpoints itself, nothing
        funnels through the driver."""
        import pyarrow as pa_
        import pyarrow.parquet as pq

        cells, ids, blobs = [], [], []
        for c in sorted(self._ids):
            for id_arr, mat in zip(self._ids[c], self._mats[c]):
                for i, row in zip(id_arr.tolist(), mat):
                    cells.append(c)
                    ids.append(i)
                    blobs.append(row.astype(np.float64).tobytes())
        t = pa_.table(
            {
                "cell": pa_.array(cells, pa_.int64()),
                "vec_id": pa_.array(ids, pa_.int64()),
                "vec": pa_.array(blobs, pa_.binary()),
            }
        )
        pq.write_table(t, path)
        return t.num_rows

    def load(self, path: str) -> int:
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        cells = t["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = t["vec"].to_pylist()
        if len(ids):
            mat = np.vstack(
                [np.frombuffer(b, dtype=np.float64) for b in blobs]
            )
            self.add(cells, ids, mat)
        return len(ids)


class VectorIndex:
    """Driver-side handle: fit centroids once, add waves, probe top-k."""

    def __init__(
        self,
        n_centroids: int = 16,
        n_shards: int = 4,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
    ) -> None:
        self.n_centroids = n_centroids
        self.id_col = id_col
        self.emb_col = emb_col
        self.shards = [_CellShard.remote() for _ in range(n_shards)]
        self.centroids: np.ndarray | None = None
        self._cref = None

    def fit(self, ds: Dataset) -> None:
        """Centroids from the deterministic smallest-id sample of
        ``ds`` (stable across runs and partitionings)."""
        from textalyzer_ray.pipelines.similarity import build_centroids
        from textalyzer_ray.stages.similarity import normalize_rows

        c = build_centroids(
            ds, self.n_centroids, emb_col=self.emb_col, id_col=self.id_col
        )
        self.centroids = normalize_rows(np.asarray(c, dtype=np.float64))
        self._cref = ray.put(self.centroids)

    def add(self, ds: Dataset) -> int:
        """Index a wave (fit() must have run). Blocks until every shard
        acknowledged."""
        if self._cref is None:
            raise RuntimeError("fit() before add()")
        shards = self.shards
        ns = len(shards)
        cref = self._cref
        id_col, emb_col = self.id_col, self.emb_col

        def ingest(t: pa.Table) -> pa.Table:
            from textalyzer_ray.stages.similarity import (
                _stack_embeddings,
                normalize_rows,
            )

            cents = ray.get(cref)
            m = normalize_rows(_stack_embeddings(t, emb_col))
            cells = np.argmax(m @ cents.T, axis=1).astype(np.int64)
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            shard = cells % ns
            acks = []
            for s in range(ns):
                msk = shard == s
                if msk.any():
                    acks.append(
                        shards[s].add.remote(cells[msk], ids[msk], m[msk])
                    )
            ray.get(acks)
            return pa.table({"n": pa.array([t.num_rows], pa.int64())})

        stats = ds.map_batches(ingest, batch_format="pyarrow").take_all()
        return int(sum(r["n"] for r in stats))

    def query_topk(
        self, ds_queries: Dataset, k: int = 5, n_probe: int | None = None
    ) -> Dataset:
        """(qid, rank, vec_id) top-k per query row of ``ds_queries``
        against everything indexed so far; rank by (sim desc, vec_id
        asc). ``n_probe=None`` probes every cell (exact)."""
        if self._cref is None:
            raise RuntimeError("fit() before query_topk()")
        shards = self.shards
        ns = len(shards)
        cref = self._cref
        id_col, emb_col = self.id_col, self.emb_col
        np_probe = self.n_centroids if n_probe is None else n_probe
        out_schema = pa.schema(
            [
                pa.field("qid", pa.int64()),
                pa.field("rank", pa.int64()),
                pa.field("vec_id", pa.int64()),
            ]
        )

        def probe(t: pa.Table) -> pa.Table:
            from textalyzer_ray.stages.similarity import (
                _stack_embeddings,
                normalize_rows,
            )

            if t.num_rows == 0:
                return out_schema.empty_table()
            cents = ray.get(cref)
            q = normalize_rows(_stack_embeddings(t, emb_col))
            qids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            csims = q @ cents.T
            probes = np.argsort(-csims, axis=1)[:, :np_probe].astype(np.int64)
            futs = []
            for s in range(ns):
                wanted = np.unique(probes[probes % ns == s])
                futs.append(shards[s].topk.remote(wanted, probes, q, k))
            parts = ray.get(futs)
            rows_q = np.concatenate([p[0] for p in parts])
            rows_i = np.concatenate([p[1] for p in parts])
            rows_s = np.concatenate([p[2] for p in parts])
            out_qid: list[int] = []
            out_rank: list[int] = []
            out_vid: list[int] = []
            for qi in range(len(qids)):
                m = rows_q == qi
                vids, sims = rows_i[m], rows_s[m]
                # stable (sim desc, id asc) total order
                order = np.lexsort((vids, -sims))[:k]
                for r, j in enumerate(order, start=1):
                    out_qid.append(int(qids[qi]))
                    out_rank.append(r)
                    out_vid.append(int(vids[j]))
            return pa.table(
                {
                    "qid": pa.array(out_qid, pa.int64()),
                    "rank": pa.array(out_rank, pa.int64()),
                    "vec_id": pa.array(out_vid, pa.int64()),
                },
                schema=out_schema,
            )

        return ds_queries.map_batches(probe, batch_format="pyarrow")

    def stats(self) -> dict:
        return {
            "vectors": sum(
                ray.get([a.n_vectors.remote() for a in self.shards])
            ),
            "n_centroids": self.n_centroids,
        }

    # -- persistence ---------------------------------------------------
    def save(self, index_dir: str) -> dict:
        """Checkpoint: per-shard parquet (written by the shard actors)
        + centroids and params in a manifest-side parquet/json pair."""
        import json
        import os

        import pyarrow.parquet as pq

        if self.centroids is None:
            raise RuntimeError("fit() before save()")
        os.makedirs(index_dir, exist_ok=True)
        ray.get(
            [
                a.save.remote(os.path.join(index_dir, f"cells_{i}.parquet"))
                for i, a in enumerate(self.shards)
            ]
        )
        pq.write_table(
            pa.table(
                {
                    "centroid": pa.array(
                        [r.tobytes() for r in self.centroids], pa.binary()
                    )
                }
            ),
            os.path.join(index_dir, "centroids.parquet"),
        )
        manifest = {
            "n_centroids": self.n_centroids,
            "n_shards": len(self.shards),
            "id_col": self.id_col,
            "emb_col": self.emb_col,
            **self.stats(),
        }
        with open(os.path.join(index_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        return manifest

    @classmethod
    def load(cls, index_dir: str) -> "VectorIndex":
        import json
        import os

        import pyarrow.parquet as pq

        with open(os.path.join(index_dir, "manifest.json")) as f:
            m = json.load(f)
        idx = cls(
            n_centroids=m["n_centroids"],
            n_shards=m["n_shards"],
            id_col=m["id_col"],
            emb_col=m["emb_col"],
        )
        cent = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
        idx.centroids = np.vstack(
            [
                np.frombuffer(b, dtype=np.float64)
                for b in cent["centroid"].to_pylist()
            ]
        )
        idx._cref = ray.put(idx.centroids)
        ray.get(
            [
                a.load.remote(os.path.join(index_dir, f"cells_{i}.parquet"))
                for i, a in enumerate(idx.shards)
            ]
        )
        return idx

    def shutdown(self) -> None:
        for a in self.shards:
            ray.kill(a)
        self.shards = []


def vector_index_topk(
    ds_index: Dataset,
    ds_queries: Dataset,
    k: int = 5,
    n_centroids: int = 16,
    n_shards: int = 4,
    n_probe: int | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """Index one wave, probe another: (qid, rank, vec_id) sorted. The
    composition the gate exercises; incremental adds are the
    VectorIndex API itself (tests)."""
    idx = VectorIndex(
        n_centroids=n_centroids,
        n_shards=n_shards,
        id_col=id_col,
        emb_col=emb_col,
    )
    try:
        ds_index = ds_index.materialize()  # consumed by fit + add
        idx.fit(ds_index)
        idx.add(ds_index)
        return (
            idx.query_topk(ds_queries, k=k, n_probe=n_probe)
            .sort(["qid", "rank"])
            .materialize()
        )
    finally:
        idx.shutdown()
