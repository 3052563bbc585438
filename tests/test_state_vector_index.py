"""Incremental IVF vector index: exact-probe equals brute force,
measured rank margins, partial-probe recall, incremental adds."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from textalyzer_ray.state.vector_index import VectorIndex, vector_index_topk

pytestmark = pytest.mark.usefixtures("quiet_data_context")

SF = "/root/testdata/sf0.001"


def load():
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(emb["vec_id"].to_pylist())
    M = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    return emb, ids, M


def brute(ids, M, qmask, rmask, k):
    sims = M[qmask] @ M[rmask].T
    qids, rids = ids[qmask], ids[rmask]
    rows, gaps = [], []
    for i, q in enumerate(qids):
        order = np.lexsort((rids, -sims[i]))
        for r in range(k):
            rows.append(
                {"qid": int(q), "rank": r + 1, "vec_id": int(rids[order[r]])}
            )
        s = sims[i][order[: k + 1]]
        gaps.append(np.min(-np.diff(s)))
    return rows, float(min(gaps))


class TestVectorIndex:
    def test_exact_probe_equals_brute_force_with_margin(self):
        emb, ids, M = load()
        even, odd = ids % 2 == 0, ids % 2 == 1
        got = vector_index_topk(
            rd.from_arrow(emb.filter(pa.array(even))).repartition(3),
            rd.from_arrow(emb.filter(pa.array(odd))).repartition(2),
            k=5,
        ).take_all()
        want, min_gap = brute(ids, M, odd, even, 5)
        assert got == want
        # rank order is only cross-engine-stable if adjacent cosine gaps
        # dwarf the ~1e-15 engine-difference bound (measured 2.65e-5)
        assert min_gap > 1e-7, min_gap

    def test_partial_probe_recall_reasonable(self):
        emb, ids, M = load()
        even, odd = ids % 2 == 0, ids % 2 == 1
        got = vector_index_topk(
            rd.from_arrow(emb.filter(pa.array(even))),
            rd.from_arrow(emb.filter(pa.array(odd))),
            k=5,
            n_probe=4,
        ).take_all()
        want, _ = brute(ids, M, odd, even, 5)
        gs = {(r["qid"], r["vec_id"]) for r in got}
        ws = {(w["qid"], w["vec_id"]) for w in want}
        recall = len(gs & ws) / len(ws)
        assert 0.3 < recall < 1.0  # approximate, not exact, not garbage

    def test_incremental_add_changes_results(self):
        emb, ids, M = load()
        idx = VectorIndex(n_centroids=8, n_shards=2)
        try:
            w1 = rd.from_arrow(emb.slice(0, 100)).materialize()
            idx.fit(w1)
            idx.add(w1)
            assert idx.stats()["vectors"] == 100
            q = rd.from_arrow(emb.slice(200, 1))
            r_before = idx.query_topk(q, k=3).take_all()
            assert all(r["vec_id"] < 100 for r in r_before)
            idx.add(rd.from_arrow(emb.slice(200, 1)))
            r_after = idx.query_topk(q, k=3).take_all()
            # the query vector itself is now indexed -> exact self-hit
            assert r_after[0]["vec_id"] == 200 and r_after[0]["rank"] == 1
            assert idx.stats()["vectors"] == 101
        finally:
            idx.shutdown()

    def test_fit_required(self):
        idx = VectorIndex(n_shards=1)
        try:
            with pytest.raises(RuntimeError):
                idx.add(rd.range(1))
        finally:
            idx.shutdown()


class TestVectorIndexPersistence:
    def test_save_load_query_equivalence(self, tmp_path):
        emb, ids, M = load()
        idx = VectorIndex(n_centroids=8, n_shards=2)
        try:
            w = rd.from_arrow(emb.slice(0, 200)).materialize()
            idx.fit(w)
            idx.add(w)
            q = rd.from_arrow(emb.slice(300, 5))
            before = idx.query_topk(q, k=4).take_all()
            m = idx.save(str(tmp_path / "vidx"))
            assert m["vectors"] == 200
        finally:
            idx.shutdown()
        idx2 = VectorIndex.load(str(tmp_path / "vidx"))
        try:
            assert idx2.stats()["vectors"] == 200
            after = idx2.query_topk(q, k=4).take_all()
            assert after == before
            # the loaded index keeps accepting vectors
            idx2.add(rd.from_arrow(emb.slice(300, 5)))
            hit = idx2.query_topk(rd.from_arrow(emb.slice(300, 1)), k=1).take_all()
            assert hit[0]["vec_id"] == hit[0]["qid"]  # exact self-hit
        finally:
            idx2.shutdown()
