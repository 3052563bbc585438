"""Dedup pipelines: exact, minhash-LSH, simhash, winnowing."""

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.pipelines.dedup import (
    connected_components,
    exact_dedup,
    minhash_dedup,
    minhash_duplicate_pairs,
    simhash_duplicate_pairs,
)
from textalyzer_ray.stages.dedup import Winnower

pytestmark = pytest.mark.usefixtures("quiet_data_context")

BASE = "the quick brown fox jumps over the lazy dog and runs far away home " * 4
NEAR = BASE.replace("lazy", "sleepy", 1)  # one token changed
OTHER = "ray data pipelines shuffle arrow record batches through object stores " * 4


def corpus_ds():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1, 2, 3, 4, 5],
                "text": [BASE, BASE, NEAR, OTHER, OTHER, "tiny"],
            }
        )
    )


class TestExactDedup:
    def test_keeps_min_id_and_counts(self):
        rows = exact_dedup(corpus_ds()).take_all()
        by_id = {r["doc_id"]: r for r in rows}
        assert set(by_id) == {0, 2, 3, 5}
        assert by_id[0]["n_copies"] == 2
        assert by_id[3]["n_copies"] == 2
        assert by_id[2]["n_copies"] == 1


class TestMinHash:
    def test_pairs_and_dedup(self):
        pairs = minhash_duplicate_pairs(
            corpus_ds(), jaccard_threshold=0.5, bands=32
        ).take_all()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert (0, 1) in got  # exact dup
        assert (0, 2) in got and (1, 2) in got  # near dup
        assert (3, 4) in got
        assert not any(5 in p for p in got)
        kept = sorted(
            r["doc_id"]
            for r in minhash_dedup(
                corpus_ds(), jaccard_threshold=0.5, bands=32
            ).take_all()
        )
        assert kept == [0, 3, 5]

    def test_no_dups(self):
        ds = rd.from_arrow(
            pa.table({"doc_id": [0, 1], "text": [BASE, OTHER]})
        )
        assert minhash_duplicate_pairs(ds).take_all() == []

    def test_dedup_distributed_anti_join_equals_broadcast(self):
        """r3 auto-switch: forcing broadcast_threshold=0 routes the keep
        filter through the distributed left_anti join; the kept set must
        equal the broadcast path's bit for bit (same rows, same schema)."""
        kwargs = dict(jaccard_threshold=0.5, bands=32)
        via_broadcast = sorted(
            (r["doc_id"], r["text"])
            for r in minhash_dedup(corpus_ds(), **kwargs).take_all()
        )
        via_join = sorted(
            (r["doc_id"], r["text"])
            for r in minhash_dedup(
                corpus_ds(), broadcast_threshold=0, **kwargs
            ).take_all()
        )
        assert via_join == via_broadcast == [
            (0, BASE),
            (3, OTHER),
            (5, "tiny"),
        ]


class TestConnectedComponents:
    def test_chain_converges(self):
        pairs = rd.from_arrow(
            pa.table({"id_a": [1, 2, 3, 10], "id_b": [2, 3, 4, 11]})
        )
        rows = connected_components(pairs).take_all()
        lab = {r["doc_id"]: r["cluster_id"] for r in rows}
        assert lab[1] == lab[2] == lab[3] == lab[4] == 1
        assert lab[10] == lab[11] == 10


class TestSimHash:
    def test_near_pairs(self):
        rows = simhash_duplicate_pairs(corpus_ds(), max_hamming=6).take_all()
        got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
        assert got.get((0, 1)) == 0  # identical docs
        assert (0, 2) in got  # near dup within hamming 6


class TestWinnower:
    def test_fingerprint_rows(self, quiet_data_context):
        ds = rd.from_arrow(
            pa.table({"doc_id": [0, 1], "text": [BASE, "prefix " + BASE]})
        )
        rows = ds.map_batches(
            Winnower, batch_format="pyarrow", concurrency=1
        ).take_all()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
        assert by_doc[0] & by_doc[1]  # shared substring fingerprints


class TestNgramJaccardPairs:
    def test_verifies_explicit_pairs(self, quiet_data_context):
        import ray.data as rd
        import pyarrow as pa

        from textalyzer_ray.pipelines.dedup import ngram_jaccard_pairs

        ds = corpus_ds()
        cands = rd.from_arrow(
            pa.table({"id_a": [0, 0, 3], "id_b": [1, 3, 5]})
        )
        rows = ngram_jaccard_pairs(ds, cands, threshold=0.0).take_all()
        got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in rows}
        assert got[(0, 1)] == 1.0       # identical docs
        assert got[(0, 3)] < 0.1        # unrelated
        assert got[(3, 5)] == 0.0


class TestGroupedApply:
    def test_exact_dedup_distributed_matches(self, quiet_data_context):
        from textalyzer_ray.pipelines.dedup import exact_dedup, exact_dedup_distributed

        a = sorted(
            (r["doc_id"], r["text"], r["n_copies"])
            for r in exact_dedup(corpus_ds()).take_all()
        )
        b = sorted(
            (r["doc_id"], r["text"], r["n_copies"])
            for r in exact_dedup_distributed(corpus_ds()).take_all()
        )
        assert a == b

    def test_grouped_apply_key_alignment(self, quiet_data_context):
        import numpy as np
        import polars as pl
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.stages.groups import grouped_apply

        rng = np.random.RandomState(3)
        t = pa.table({"k": rng.randint(0, 5000, 40_000), "v": np.arange(40_000)})
        ds = rd.from_arrow(t).repartition(8)

        def per_block(b: pa.Table) -> pa.Table:
            return (
                pl.from_arrow(b)
                .group_by("k")
                .agg(pl.len().cast(pl.Int64).alias("n"))
                .to_arrow()
            )

        rows = grouped_apply(ds, ["k"], per_block, num_partitions=8).take_all()
        got = {r["k"]: r["n"] for r in rows}
        # one output row per key proves key alignment (no split groups)
        assert len(rows) == len(got)
        import collections

        expected = collections.Counter(t["k"].to_pylist())
        assert got == dict(expected)

    def test_followed_by_sort_on_default_strategy(self, quiet_data_context):
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.stages.groups import grouped_apply

        ds = rd.from_arrow(pa.table({"k": [1, 2, 1, 3], "v": [1, 2, 3, 4]}))
        out = grouped_apply(ds, ["k"], lambda b: b, num_partitions=2).sort("v")
        assert [r["v"] for r in out.take_all()] == [1, 2, 3, 4]


class TestScaleShape:
    def test_no_string_column_in_lsh_features(self):
        """VERDICT r1 #1: nothing shuffled by the LSH path may carry
        text. The feature stage's output schema is ints/lists only."""
        from textalyzer_ray.stages.dedup import MinHashFeatures

        t = pa.table({"doc_id": [1, 2], "text": [BASE, NEAR]})
        out = MinHashFeatures()(t)
        assert set(out.column_names) == {"doc_id", "shingle_hashes", "band_hash"}
        for f in out.schema:
            assert not pa.types.is_string(f.type) and not pa.types.is_large_string(
                f.type
            ), f"string column {f.name} would ride the shuffle"
        assert pa.types.is_list(out.schema.field("shingle_hashes").type)
        assert out.schema.field("shingle_hashes").type.value_type == pa.uint64()

    def test_hash_jaccard_matches_string_jaccard(self):
        from textalyzer_ray.core.fingerprint import (
            jaccard,
            jaccard_from_hashes,
            shingle_hash_set,
        )
        from textalyzer_ray.core.textmetrics import tokenize

        for a, b in [(BASE, NEAR), (BASE, OTHER), ("", ""), (BASE, "")]:
            ta, tb = tokenize(a), tokenize(b)
            assert jaccard_from_hashes(
                shingle_hash_set(ta, 3), shingle_hash_set(tb, 3)
            ) == pytest.approx(jaccard(ta, tb, 3))

    def test_long_path_graph_converges_distributed(self):
        """VERDICT r1 #2: a path of >= 4 hops must converge through the
        dataset-join propagation (no driver label dict)."""
        n = 9  # path 0-1-2-...-9: diameter 9, several propagation rounds
        pairs = rd.from_arrow(
            pa.table(
                {"id_a": list(range(n)), "id_b": [i + 1 for i in range(n)]}
            )
        )
        rows = connected_components(pairs).take_all()
        lab = {r["doc_id"]: r["cluster_id"] for r in rows}
        assert lab == {i: 0 for i in range(n + 1)}


class TestSimHashMultiTable:
    def test_pigeonhole_recall_within_chunks(self):
        """4 disjoint 16-bit chunk tables: any pair with hamming <= 3
        shares at least one untouched chunk (pigeonhole), so it MUST
        collide in some table — including pairs differing ONLY in the
        top 16 bits (the old single-prefix table's blind spot)."""
        import numpy as np

        h1 = np.uint64(0xDEADBEEF12345678)
        for flipped_bits in [
            [63],              # top chunk only — old design missed this
            [63, 62, 61],      # 3 bits, all in the top chunk
            [0, 21, 47],       # spread over 3 different chunks
        ]:
            h2 = h1
            for b in flipped_bits:
                h2 = np.uint64(int(h2) ^ (1 << b))
            chunks1 = [(int(h1) >> (64 - 16 * (j + 1))) & 0xFFFF for j in range(4)]
            chunks2 = [(int(h2) >> (64 - 16 * (j + 1))) & 0xFFFF for j in range(4)]
            assert any(a == b for a, b in zip(chunks1, chunks2)), flipped_bits

    def test_planted_prefix_divergent_pair_found(self):
        """End-to-end: a pair whose simhash diff (hamming=2) includes a
        TOP-16-bit flip — invisible to the old single-prefix table — is
        found by the multi-table pipeline."""
        from textalyzer_ray.core.fingerprint import hamming64, simhash64
        from textalyzer_ray.core.textmetrics import frequency_map
        from textalyzer_ray.pipelines.dedup import simhash_duplicate_pairs

        base = (
            "him bus bel des dan cur cat bun gom bos ham fol ben bem bot "
            "cum cut ger has hur got con hor fit cun ful hal det bam ces "
            "hol dur han cer hin dun hos hir fem bul"
        )
        near = base.replace("hor", "fam")
        h0 = simhash64(frequency_map(base))
        h2 = simhash64(frequency_map(near))
        assert 0 < hamming64(h0, h2) <= 3
        assert (h0 >> 48) != (h2 >> 48)  # top chunk differs
        ds = rd.from_arrow(pa.table({"doc_id": [1, 2], "text": [base, near]}))
        rows = simhash_duplicate_pairs(ds, max_hamming=3).take_all()
        assert any(r["id_a"] == 1 and r["id_b"] == 2 for r in rows), rows

    def test_poly_hash_pipeline_equals_brute_force(self):
        """hash_fn="poly" (the SQL-recomputable token hash behind the r3
        simhash_pairs driver oracle): the pipeline's hamming<=3 pair set
        must equal the brute-force all-pairs recomputation, and poly
        simhashes must differ from stable ones (really a different hash)."""
        from textalyzer_ray.core.fingerprint import (
            hamming64,
            polyhash64,
            simhash64,
        )
        from textalyzer_ray.core.textmetrics import frequency_map
        from textalyzer_ray.pipelines.dedup import simhash_duplicate_pairs

        base = (
            "him bus bel des dan cur cat bun gom bos ham fol ben bem bot "
            "cum cut ger has hur got con hor fit cun ful hal det bam ces "
            "hol dur han cer hin dun hos hir fem bul"
        )
        texts = {
            1: base,
            2: base.replace("hor", "pip"),  # poly-hamming 3 (measured)
            3: base,  # hamming 0 twin
            4: "one two three four five six seven eight nine ten eleven",
            5: "completely unrelated text about sorting networks and heaps",
        }
        sketches = {
            i: simhash64(frequency_map(t), polyhash64) for i, t in texts.items()
        }
        assert sketches[1] != simhash64(frequency_map(texts[1]))
        want = sorted(
            (a, b)
            for a in texts
            for b in texts
            if a < b and hamming64(sketches[a], sketches[b]) <= 3
        )
        ds = rd.from_arrow(
            pa.table(
                {"doc_id": list(texts), "text": [texts[i] for i in texts]}
            )
        )
        rows = simhash_duplicate_pairs(ds, max_hamming=3, hash_fn="poly").take_all()
        got = sorted((r["id_a"], r["id_b"]) for r in rows)
        assert got == want and len(want) >= 1, (got, want)

    def test_polyhash64_known_values(self):
        """Pin polyhash64's exact arithmetic (the SQL oracle re-derives
        these same numbers in HUGEINT): rolling B=1000003 poly, odd mix
        C=0x2545F4914F6CDD1D, high-half xor fold."""
        from textalyzer_ray.core.fingerprint import polyhash64

        B, C, M = 1_000_003, 0x2545F4914F6CDD1D, 1 << 64
        for s in ("a", "the", "zebra", "x" * 40):
            h = 0
            for byte in s.encode():
                h = (h * B + byte) % M
            m = (h * C) % M
            hi, lo = m >> 32, (m & 0xFFFFFFFF) ^ (m >> 32)
            assert polyhash64(s) == (hi << 32) | lo
        # all 64 bit positions exercised across a small vocabulary
        import itertools

        union = 0
        for s in ("".join(p) for p in itertools.permutations("abcde", 3)):
            union |= polyhash64(s)
        assert union == (1 << 64) - 1


class TestWinnowPairs:
    def test_shared_substring_detected_across_reorder(self):
        from textalyzer_ray.pipelines.dedup import winnow_duplicate_pairs

        shared = "the quick brown fox jumps over the lazy dog again and again"
        docs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": [1, 2, 3],
                    "text": [
                        "PREFIX one " + shared + " SUFFIX one",
                        "totally different opener " + shared + " other tail",
                        "no overlap here at all zzz qqq www eee rrr ttt yyy",
                    ],
                }
            )
        )
        rows = winnow_duplicate_pairs(docs, min_shared=2).take_all()
        got = {(r["id_a"], r["id_b"]): r["n_shared"] for r in rows}
        assert (1, 2) in got and got[(1, 2)] >= 2
        assert not any(3 in k for k in got)

    def test_no_dups_empty(self):
        from textalyzer_ray.pipelines.dedup import winnow_duplicate_pairs

        docs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": [1, 2],
                    "text": [
                        "alpha beta gamma delta epsilon zeta",
                        "one two three four five six seven",
                    ],
                }
            )
        )
        assert winnow_duplicate_pairs(docs, min_shared=2).take_all() == []


class TestConnectedComponentsEdgeCases:
    def test_duplicate_edges_and_self_loops(self):
        pairs = rd.from_arrow(
            pa.table(
                {
                    "id_a": [1, 1, 2, 7, 5],
                    "id_b": [2, 2, 1, 7, 6],  # dup edge, reverse, self-loop
                }
            )
        )
        rows = connected_components(pairs).take_all()
        lab = {r["doc_id"]: r["cluster_id"] for r in rows}
        assert lab[1] == lab[2] == 1
        assert lab[7] == 7
        assert lab[5] == lab[6] == 5

    def test_empty_edges(self):
        pairs = rd.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
        )
        assert connected_components(pairs).take_all() == []


class TestConnectedComponentsPaths:
    """Both CC mechanisms must agree: the small-graph union-find task
    and the distributed label-propagation loop."""

    def _random_pairs(self, seed=11, n_nodes=200, n_edges=150):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        rng = np.random.RandomState(seed)
        a = rng.randint(0, n_nodes, n_edges)
        b = rng.randint(0, n_nodes, n_edges)
        keep = a != b
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array(np.minimum(a, b)[keep], pa.int64()),
                    "id_b": pa.array(np.maximum(a, b)[keep], pa.int64()),
                }
            )
        ).repartition(4)

    def test_small_path_equals_distributed(self):
        from textalyzer_ray.pipelines.dedup import connected_components

        fast = {
            (r["doc_id"], r["cluster_id"])
            for r in connected_components(self._random_pairs()).take_all()
        }
        slow = {
            (r["doc_id"], r["cluster_id"])
            for r in connected_components(
                self._random_pairs(), small_threshold=0
            ).take_all()
        }
        assert fast == slow and len(fast) > 0

    def test_small_path_long_chain(self):
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.dedup import connected_components

        # 30-hop path: exercises path compression + min-root labeling
        edges = rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array(list(range(30)), pa.int64()),
                    "id_b": pa.array(list(range(1, 31)), pa.int64()),
                }
            )
        )
        rows = connected_components(edges).take_all()
        assert {r["cluster_id"] for r in rows} == {0}
        assert len(rows) == 31


class TestDedupKeepBest:
    def _run(self, rows, **kw):
        import ray.data as rd

        from textalyzer_ray.pipelines.dedup import dedup_keep_best

        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "score": pa.array([r[1] for r in rows], pa.int64()),
                "text": [r[2] for r in rows],
            }
        )
        return (
            dedup_keep_best(rd.from_arrow(t), score_col="score", **kw)
            .sort("doc_id")
            .take_all()
        )

    def test_keeps_argmax_score(self):
        rows = [
            (1, 5, "same text"),
            (2, 9, "same text"),
            (3, 7, "same text"),
            (4, 1, "unique"),
        ]
        got = self._run(rows)
        assert [(r["doc_id"], r["score"], r["n_copies"]) for r in got] == [
            (2, 9, 3),
            (4, 1, 1),
        ]

    def test_score_tie_breaks_by_lowest_id(self):
        rows = [(7, 3, "t"), (2, 3, "t"), (9, 3, "t")]
        got = self._run(rows)
        assert [(r["doc_id"], r["n_copies"]) for r in got] == [(2, 3)]

    def test_partitioning_invariant(self):
        import ray.data as rd

        from textalyzer_ray.pipelines.dedup import dedup_keep_best

        rows = [(i, (i * 13) % 7, f"text {i % 5}") for i in range(60)]
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "score": pa.array([r[1] for r in rows], pa.int64()),
                "text": [r[2] for r in rows],
            }
        )
        one = dedup_keep_best(
            rd.from_arrow(t), score_col="score"
        ).sort("doc_id").to_pandas()
        many = dedup_keep_best(
            rd.from_arrow(t).repartition(7), score_col="score"
        ).sort("doc_id").to_pandas()
        assert one.equals(many)
        assert len(one) == 5
