"""BPE trainer (pipelines/bpe.py): pure-python reference equality,
greedy-chain semantics, tie order, degenerate inputs."""

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.pipelines.bpe import bpe_train

pytestmark = pytest.mark.usefixtures("quiet_data_context")


def reference(word_counts, n_merges):
    """Classic sequential BPE trainer (get_stats + greedy leftmost)."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        stats = {}
        for w, c in word_counts.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] = stats.get((s[i], s[i + 1]), 0) + c
        if not stats:
            break
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def run(word_counts, n_merges):
    ds = rd.from_arrow(
        pa.table(
            {
                "word": list(word_counts),
                "count": pa.array(list(word_counts.values()), pa.int64()),
            }
        )
    )
    out = bpe_train(ds, n_merges=n_merges)
    return list(
        zip(
            out["left"].to_pylist(),
            out["right"].to_pylist(),
            out["pair_count"].to_pylist(),
        )
    )


class TestBpeTrain:
    def test_matches_sequential_reference(self):
        wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "wide": 1}
        assert run(wc, 6) == reference(wc, 6)

    def test_greedy_chain_overlap(self):
        # 'aaa' yields 2 overlapping (a,a) pairs in stats but only ONE
        # merge application (leftmost); 'aaaa' yields two
        wc = {"aaa": 4, "aaaa": 2}
        got = run(wc, 2)
        want = reference(wc, 2)
        assert got == want
        assert got[0] == ("a", "a", 4 * 2 + 2 * 3)

    def test_tie_breaks_lexicographic(self):
        # (a,b) and (c,d) both count 3 -> (a,b) first
        wc = {"ab": 3, "cd": 3}
        got = run(wc, 2)
        assert got[0][:2] == ("a", "b")
        assert got[1][:2] == ("c", "d")

    def test_exhausts_when_no_pairs_remain(self):
        wc = {"ab": 2}
        got = run(wc, 5)
        assert len(got) == 1  # after merging (a,b) nothing is adjacent

    def test_single_char_words_only(self):
        wc = {"a": 3, "b": 2}
        assert run(wc, 3) == []

    def test_merged_symbols_recombine(self):
        # multi-round: merged symbol participates in later pairs
        wc = {"abc": 5}
        got = run(wc, 2)
        assert got == [("a", "b", 5), ("ab", "c", 5)]

    def test_partitioning_invariant(self):
        wc = {f"w{i}xyz"[-(i % 4 + 2):]: i + 1 for i in range(40)}
        ds1 = rd.from_arrow(
            pa.table(
                {
                    "word": list(wc),
                    "count": pa.array(list(wc.values()), pa.int64()),
                }
            )
        )
        one = bpe_train(ds1, n_merges=4).to_pydict()
        ds2 = rd.from_arrow(
            pa.table(
                {
                    "word": list(wc),
                    "count": pa.array(list(wc.values()), pa.int64()),
                }
            )
        ).repartition(7)
        many = bpe_train(ds2, n_merges=4).to_pydict()
        assert one == many


class TestBpeDocTokenCounts:
    def test_matches_reference_application(self):
        import re

        from textalyzer_ray.pipelines.bpe import bpe_doc_token_counts

        docs = [
            (0, "low low low lower newest"),
            (1, "newest widest newest"),
            (2, ""),
            (3, "zzz"),
        ]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                    "text": [d[1] for d in docs],
                }
            )
        ).materialize()
        got = bpe_doc_token_counts(ds, n_merges=4).sort("doc_id").take_all()

        # reference: train on the aggregated vocab, apply per word
        import collections

        wc = collections.Counter(
            w.lower()
            for _, s in docs
            for w in re.split(r"[^A-Za-z]+", s)
            if w
        )
        merges = reference(wc, 4)
        seqs = {w: list(w) for w in wc}
        for a, b, _ in merges:
            for w in seqs:
                s, o, i = seqs[w], [], 0
                while i < len(s):
                    if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                        o.append(a + b)
                        i += 2
                    else:
                        o.append(s[i])
                        i += 1
                seqs[w] = o
        want = []
        for i, s in docs:
            toks = [w.lower() for w in re.split(r"[^A-Za-z]+", s) if w]
            want.append((i, sum(len(seqs[w]) for w in toks)))
        assert [(r["doc_id"], r["n_bpe_tokens"]) for r in got] == want

    def test_fewer_tokens_than_chars(self):
        from textalyzer_ray.pipelines.bpe import bpe_doc_token_counts

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": ["aaaa aaaa aaaa", "aaaa"],
                }
            )
        ).materialize()
        got = bpe_doc_token_counts(ds, n_merges=2).sort("doc_id").take_all()
        # merges (a,a) then (aa,aa): each 'aaaa' -> 1 token
        assert [r["n_bpe_tokens"] for r in got] == [3, 1]


class TestBpeDistributedPath:
    """small_threshold=0 forces the per-round Dataset path; it must
    equal both the sequential reference and the one-task small path."""

    def test_paths_agree(self):
        wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaa": 4}
        ds1 = rd.from_arrow(
            pa.table(
                {
                    "word": list(wc),
                    "count": pa.array(list(wc.values()), pa.int64()),
                }
            )
        )
        big = bpe_train(ds1, n_merges=5, small_threshold=0)
        ds2 = rd.from_arrow(
            pa.table(
                {
                    "word": list(wc),
                    "count": pa.array(list(wc.values()), pa.int64()),
                }
            )
        )
        small = bpe_train(ds2, n_merges=5)
        assert big.to_pydict() == small.to_pydict()
        got = list(
            zip(
                big["left"].to_pylist(),
                big["right"].to_pylist(),
                big["pair_count"].to_pylist(),
            )
        )
        assert got == reference(wc, 5)

    def test_return_state_agrees_across_paths(self):
        wc = {"abab": 3, "abc": 2}
        def run(thresh):
            ds = rd.from_arrow(
                pa.table(
                    {
                        "word": list(wc),
                        "count": pa.array(list(wc.values()), pa.int64()),
                    }
                )
            )
            m, st = bpe_train(ds, n_merges=2, return_state=True,
                              small_threshold=thresh)
            rows = sorted(
                (r["word"], tuple(r["syms"])) for r in st.take_all()
            )
            return m.to_pydict(), rows
        assert run(0) == run(2_000_000)
