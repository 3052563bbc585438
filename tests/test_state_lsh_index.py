"""Incremental sharded LSH index: wave semantics, within-wave and
cross-wave near-dups, drop-against-dropped chains, index growth."""

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.state.lsh_index import LshIndex, lsh_index_dedup

pytestmark = pytest.mark.usefixtures("quiet_data_context")

BASE = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strong potions beneath the ancient stone bridge at midnight"
)
OTHER = (
    "completely different subject matter here involving spacecraft "
    "navigation systems and orbital mechanics calculations for mars"
)


def docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }
        )
    )


class TestLshIndexDedup:
    def test_cross_and_within_wave(self):
        w1 = docs([(0, BASE), (1, OTHER), (2, "xyz " + BASE)])  # 2 dups 0
        w2 = docs([(10, "abc " + BASE), (11, OTHER + " extended")])
        kept = lsh_index_dedup(
            [w1, w2], jaccard_threshold=0.5, n_band_shards=2, n_doc_shards=2
        ).take_all()
        kept_ids = [r["doc_id"] for r in kept]
        assert 0 in kept_ids and 1 in kept_ids
        assert 2 not in kept_ids  # within-wave dup of 0
        assert 10 not in kept_ids  # cross-wave dup of 0
        # 11 is near 1 only if jaccard >= 0.5: " extended" adds 1 token
        # over ~10 -> jaccard ~0.9, so it drops too
        assert 11 not in kept_ids

    def test_drop_against_dropped_earlier(self):
        # 2 dups 1, 1 dups 0: both 1 and 2 drop (earlier = ALL earlier
        # docs, kept or not — the oracle's NOT-IN semantics)
        w = docs([(0, BASE), (1, "xx " + BASE), (2, "xx yy " + BASE)])
        kept = lsh_index_dedup([w], jaccard_threshold=0.5).take_all()
        assert [r["doc_id"] for r in kept] == [0]

    def test_no_dups_all_kept(self):
        w = docs([(0, BASE), (1, OTHER)])
        kept = lsh_index_dedup([w], jaccard_threshold=0.5).take_all()
        assert [r["doc_id"] for r in kept] == [0, 1]

    def test_index_grows_and_stats(self):
        idx = LshIndex(n_band_shards=2, n_doc_shards=2)
        try:
            n = idx.add(docs([(0, BASE), (1, OTHER)]))
            assert n == 2
            s1 = idx.stats()
            assert s1["docs"] == 2 and s1["postings"] > 0
            idx.add(docs([(2, OTHER + " more")]))
            s2 = idx.stats()
            assert s2["docs"] == 3 and s2["postings"] >= s1["postings"]
            res = {
                r["doc_id"]: r["dropped"]
                for r in idx.query_earlier(docs([(5, BASE)])).take_all()
            }
            assert res == {5: True}
        finally:
            idx.shutdown()

    def test_empty_wave(self):
        empty = docs([])
        w = docs([(0, BASE)])
        kept = lsh_index_dedup([w, empty]).take_all()
        assert [r["doc_id"] for r in kept] == [0]


class TestLshIndexPersistence:
    def test_save_load_query_equivalence(self, tmp_path):
        idx = LshIndex(n_band_shards=2, n_doc_shards=2, jaccard_threshold=0.5)
        try:
            idx.add(docs([(0, BASE), (1, OTHER)]))
            m = idx.save(str(tmp_path / "idx"))
            assert m["docs"] == 2 and m["postings"] > 0
            q = docs([(5, "zz " + BASE), (6, "unrelated text entirely new")])
            before = idx.query_earlier(q).take_all()
        finally:
            idx.shutdown()
        idx2 = LshIndex.load(str(tmp_path / "idx"))
        try:
            assert idx2.stats() == {"postings": m["postings"], "docs": m["docs"]}
            after = idx2.query_earlier(q).take_all()
            assert sorted(after, key=lambda r: r["doc_id"]) == sorted(
                before, key=lambda r: r["doc_id"]
            )
            assert {r["doc_id"]: r["dropped"] for r in after} == {
                5: True,
                6: False,
            }
            # the loaded index keeps accepting waves
            idx2.add(docs([(7, OTHER + " tail")]))
            assert idx2.stats()["docs"] == 3
        finally:
            idx2.shutdown()
