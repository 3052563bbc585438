"""Curation pipelines: per-group quota cap, deterministic hash split."""

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.pipelines.curation import cap_per_group, hash_split

pytestmark = pytest.mark.usefixtures("quiet_data_context")


def make_ds():
    rows = []
    for s, count in (("a", 7), ("b", 2), ("c", 1)):
        for i in range(count):
            rows.append((s, len(rows) * 10 + 3))
    return rd.from_arrow(
        pa.table(
            {
                "source": [r[0] for r in rows],
                "doc_id": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )


class TestCapPerGroup:
    def test_caps_and_orders(self):
        ds = make_ds()
        got = [
            (r["source"], r["doc_id"])
            for r in cap_per_group(ds, "source", 3, "doc_id").take_all()
        ]
        assert got == [
            ("a", 3), ("a", 13), ("a", 23),
            ("b", 73), ("b", 83),
            ("c", 93),
        ]

    def test_cap_larger_than_groups(self):
        ds = make_ds()
        assert cap_per_group(ds, "source", 100, "doc_id").count() == 10

    def test_local_prune_equivalence_many_blocks(self):
        # split input into many blocks: local prune + key-aligned head
        # must equal a single global head
        import numpy as np

        rng = np.random.RandomState(7)
        n = 5000
        srcs = [f"s{rng.randint(20)}" for _ in range(n)]
        ids = rng.permutation(n).tolist()
        ds = rd.from_arrow(
            pa.table({"source": srcs, "doc_id": pa.array(ids, pa.int64())})
        ).repartition(16)
        got = [
            (r["source"], r["doc_id"])
            for r in cap_per_group(ds, "source", 5, "doc_id").take_all()
        ]
        import collections

        exp = []
        per = collections.defaultdict(list)
        for s, i in zip(srcs, ids):
            per[s].append(i)
        for s in sorted(per):
            exp.extend((s, i) for i in sorted(per[s])[:5])
        assert got == exp


class TestHashSplit:
    def test_deterministic_and_fraction(self):
        ids = list(range(10_000))
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
        rows = hash_split(ds, "doc_id", train_fraction=0.875).take_all()
        by_id = {r["doc_id"]: r["split"] for r in rows}
        # exact per-id rule
        for i in (0, 1, 4242, 9999):
            h = ((i % (1 << 32)) * 2654435761) % (1 << 32)
            exp = "train" if h < int(0.875 * (1 << 32)) else "val"
            assert by_id[i] == exp
        frac = sum(1 for v in by_id.values() if v == "train") / len(by_id)
        assert abs(frac - 0.875) < 0.02

    def test_partitioning_invariant(self):
        ids = list(range(1000))
        t = pa.table({"doc_id": pa.array(ids, pa.int64())})
        a = {r["doc_id"]: r["split"]
             for r in hash_split(rd.from_arrow(t), "doc_id").take_all()}
        b = {r["doc_id"]: r["split"]
             for r in hash_split(rd.from_arrow(t).repartition(13), "doc_id").take_all()}
        assert a == b


class TestDedupAgainst:
    def test_removes_ref_texts_exactly(self):
        from textalyzer_ray.pipelines.curation import dedup_against

        new = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "text": ["aa", "bb", "cc", "bb"],
                }
            )
        )
        ref = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([100, 101], pa.int64()),
                    "text": ["bb", "zz"],
                }
            )
        )
        got = [(r["doc_id"], r["text"]) for r in dedup_against(new, ref).take_all()]
        assert got == [(1, "aa"), (3, "cc")]

    def test_empty_ref_keeps_all(self):
        from textalyzer_ray.pipelines.curation import dedup_against

        new = rd.from_arrow(
            pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": ["a", "b"]})
        )
        ref = rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
        )
        assert dedup_against(new, ref).count() == 2


class TestBpeTokenCounts:
    def test_matches_re_findall(self):
        import re

        from textalyzer_ray.pipelines.frequency import (
            BPE_PRETOKEN_RE,
            bpe_token_counts,
        )

        texts = ["Hello, world! It's 2024...", "", "a1b2 c--d\n\te", "x" * 10]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": texts,
                }
            )
        )
        rows = bpe_token_counts(ds).take_all()
        got = [r["n_bpe_tokens"] for r in rows]
        assert got == [len(re.findall(BPE_PRETOKEN_RE, t)) for t in texts]


class TestDedupLinesRebuild:
    def test_c4_semantics(self):
        from textalyzer_ray.pipelines.curation import dedup_lines_rebuild

        # doc 1: A B C ; doc 2: B D ; doc 3: A (all lines of doc 3 dup)
        rows = [
            (1, 1, "aaa"), (1, 2, "bbb"), (1, 3, "ccc"),
            (2, 1, "bbb"), (2, 2, "ddd"),
            (3, 1, "aaa"),
        ]
        lines = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "line_number": pa.array([r[1] for r in rows], pa.int64()),
                    "content": [r[2] for r in rows],
                }
            )
        ).repartition(3)
        got = [
            (r["doc_id"], r["text"])
            for r in dedup_lines_rebuild(lines).take_all()
        ]
        assert got == [(1, "aaa bbb ccc"), (2, "ddd")]

    def test_no_duplicates_identity(self):
        from textalyzer_ray.pipelines.curation import dedup_lines_rebuild

        lines = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 1, 2], pa.int64()),
                    "line_number": pa.array([1, 2, 1], pa.int64()),
                    "content": ["x", "y", "z"],
                }
            )
        )
        got = [
            (r["doc_id"], r["text"])
            for r in dedup_lines_rebuild(lines).take_all()
        ]
        assert got == [(1, "x y"), (2, "z")]


class TestHashSample:
    def test_bottom_k_deterministic(self):
        from textalyzer_ray.pipelines.curation import hash_sample

        ids = list(range(1000))
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": [f"d{i}" for i in ids]})
        a = [r["doc_id"] for r in hash_sample(rd.from_arrow(t), 25).take_all()]
        b = [r["doc_id"] for r in hash_sample(rd.from_arrow(t).repartition(9), 25).take_all()]
        assert a == b and len(a) == 25
        # matches the explicit hash rule
        exp = sorted(ids, key=lambda i: (((i % (1 << 32)) * 2654435761) % (1 << 32), i))[:25]
        assert a == exp


class TestCurationFunnel:
    def test_filter_dedup_split_compose(self):
        from textalyzer_ray.pipelines.curation import curation_funnel

        # doc 0: 60 good words (passes word-count rule)
        # doc 1: same text (all lines duplicate doc 0's -> vanishes)
        # doc 2: 10 words (fails the 50-word rule -> filtered)
        good = " ".join(f"word{chr(97+i%26)}x" for i in range(60))
        docs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": [good, good, "short text only here now ok"],
                }
            )
        )

        def explode(batch):
            ids, lnos, cont = [], [], []
            for d, t in zip(
                batch["doc_id"].to_pylist(), batch["text"].to_pylist()
            ):
                ws = t.split(" ")
                for i in range(0, len(ws), 6):
                    ids.append(d)
                    lnos.append(i // 6 + 1)
                    cont.append(" ".join(ws[i : i + 6]))
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "line_number": pa.array(lnos, pa.int64()),
                    "content": cont,
                }
            )

        rules = ["r_word_count", "r_mean_word_len", "r_alpha_words"]
        rows = curation_funnel(docs, explode, rules=rules).take_all()
        assert [r["doc_id"] for r in rows] == [0]
        assert rows[0]["text"] == good
        assert rows[0]["split"] in ("train", "val")


class TestTokenShardAssignment:
    def test_prefix_scan_matches_serial(self):
        from textalyzer_ray.pipelines.curation import token_shard_assignment

        texts = ["w " * (i % 7 + 1) for i in range(200)]  # 1..7 tokens
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(200), pa.int64()),
                    "text": [t.strip() for t in texts],
                }
            )
        ).repartition(9)
        rows = token_shard_assignment(ds, budget=20).take_all()
        assert [r["doc_id"] for r in rows] == list(range(200))
        prefix = 0
        for r in rows:
            assert r["shard_id"] == prefix // 20
            prefix += r["n_tokens"]

    def test_single_huge_doc_owns_shard(self):
        from textalyzer_ray.pipelines.curation import token_shard_assignment

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": ["a b", "c " * 100, "d"],
                }
            )
        )
        rows = token_shard_assignment(ds, budget=10).take_all()
        assert [r["shard_id"] for r in rows] == [0, 0, 10]


class TestMixtureSample:
    def test_weights_and_determinism(self):
        from textalyzer_ray.pipelines.curation import _MIX_MULT, mixture_sample

        n = 4000
        srcs = ["a" if i % 2 == 0 else "b" for i in range(n)]
        t = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "source": srcs,
            }
        )
        w = {"a": 0.25, "b": 1.0}
        kept = mixture_sample(rd.from_arrow(t), w).take_all()
        ids = {r["doc_id"] for r in kept}
        # explicit rule parity
        for i in range(n):
            h = ((i % (1 << 32)) * _MIX_MULT) % (1 << 32)
            exp = h < int(w[srcs[i]] * (1 << 32))
            assert (i in ids) == exp
        # fractions near targets
        na = sum(1 for r in kept if r["source"] == "a") / (n / 2)
        nb = sum(1 for r in kept if r["source"] == "b") / (n / 2)
        assert abs(na - 0.25) < 0.05 and nb == 1.0
        # partitioning-invariant
        kept2 = mixture_sample(rd.from_arrow(t).repartition(11), w).take_all()
        assert {r["doc_id"] for r in kept2} == ids

    def test_independent_of_hash_split(self):
        from textalyzer_ray.pipelines.curation import hash_split, mixture_sample

        n = 8000
        t = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "source": ["s"] * n,
            }
        )
        kept = mixture_sample(rd.from_arrow(t), {"s": 0.5}).take_all()
        ids = [r["doc_id"] for r in kept]
        split = {
            r["doc_id"]: r["split"]
            for r in hash_split(rd.from_arrow(t), "doc_id", 0.5).take_all()
        }
        frac_train = sum(1 for i in ids if split[i] == "train") / len(ids)
        # if the hashes were shared, kept docs would be ~all train
        assert 0.4 < frac_train < 0.6


class TestEmptyInputs:
    """Every curation-family pipeline must survive an empty corpus
    (schema-less empty blocks are how the funnel bug manifested)."""

    def _empty_docs(self):
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                    "source": pa.array([], pa.string()),
                }
            )
        )

    def test_empty_everything(self):
        import numpy as np

        from textalyzer_ray.pipelines.curation import (
            cap_per_group,
            dedup_against,
            dedup_lines_rebuild,
            hash_sample,
            hash_split,
            mixture_sample,
            token_shard_assignment,
        )

        e = self._empty_docs()
        assert cap_per_group(e.drop_columns(["text"]), "source", 3, "doc_id").count() == 0
        assert hash_split(e, "doc_id").count() == 0
        assert hash_sample(e, 5).count() == 0
        assert mixture_sample(e, {"a": 0.5}).count() == 0
        assert dedup_against(e.drop_columns(["source"]), e.drop_columns(["source"])).count() == 0
        lines = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "line_number": pa.array([], pa.int64()),
                    "content": pa.array([], pa.string()),
                }
            )
        )
        assert dedup_lines_rebuild(lines).count() == 0
        assert token_shard_assignment(e.drop_columns(["source"]), 100).count() == 0

    def test_empty_similarity(self):
        from textalyzer_ray.pipelines.similarity import (
            cosine_pairs_exact,
            knn_self_join,
        )

        e = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float32())),
                }
            )
        )
        assert cosine_pairs_exact(e, 0.5).count() == 0
        assert knn_self_join(e, k=3).count() == 0

    def test_empty_top_words(self):
        from textalyzer_ray.pipelines.frequency import approx_top_words

        e = self._empty_docs().drop_columns(["source"])
        top, cert = approx_top_words(e, k=5)
        assert top.count() == 0 and cert is True


class TestDecontaminate:
    def test_overlap_dropped_exactly(self):
        from textalyzer_ray.pipelines.curation import decontaminate

        eval_ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([100], pa.int64()),
                    "text": ["alpha beta gamma delta epsilon zeta"],
                }
            )
        )
        train = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": [
                        # shares the 5-gram "beta gamma delta epsilon zeta"
                        "intro beta gamma delta epsilon zeta outro",
                        # shares only a 4-gram -> clean at n=5
                        "beta gamma delta epsilon other words here",
                        "completely unrelated text with no overlap at all",
                    ],
                }
            )
        )
        got = [r["doc_id"] for r in decontaminate(train, eval_ds, n=5).take_all()]
        assert got == [1, 2]

    def test_no_eval_overlap_keeps_all(self):
        from textalyzer_ray.pipelines.curation import decontaminate

        eval_ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([9], pa.int64()),
                    "text": ["qq ww ee rr tt yy"],
                }
            )
        )
        train = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": ["aa bb cc dd ee ff", "gg hh ii jj kk ll"],
                }
            )
        )
        assert decontaminate(train, eval_ds, n=5).count() == 2

    def test_distributed_semi_join_equals_broadcast(self):
        """r3 auto-switch: broadcast_threshold=0 forces the distributed
        left_semi gram join; clean set must equal the broadcast path's."""
        from textalyzer_ray.pipelines.curation import decontaminate

        eval_ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([100], pa.int64()),
                    "text": ["alpha beta gamma delta epsilon zeta"],
                }
            )
        )

        def train():
            return rd.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array([0, 1, 2], pa.int64()),
                        "text": [
                            "intro beta gamma delta epsilon zeta outro",
                            "beta gamma delta epsilon other words here",
                            "completely unrelated text with no overlap at all",
                        ],
                    }
                )
            )

        want = [
            (r["doc_id"], r["text"])
            for r in decontaminate(train(), eval_ds, n=5).take_all()
        ]
        got = [
            (r["doc_id"], r["text"])
            for r in decontaminate(
                train(), eval_ds, n=5, broadcast_threshold=0
            ).take_all()
        ]
        assert got == want and [i for i, _ in want] == [1, 2]


class TestScrubPii:
    def test_redaction_and_counts(self):
        from textalyzer_ray.pipelines.curation import scrub_pii

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": [
                        "mail j.doe+x@ex-a.co.uk and a@b.io now",
                        "call +1 (555) 123-4567 ok",
                        "nothing sensitive",
                    ],
                }
            )
        )
        rows = scrub_pii(ds).take_all()
        assert rows[0]["text"] == "mail <EMAIL> and <EMAIL> now"
        assert rows[0]["n_emails"] == 2 and rows[0]["n_phones"] == 0
        assert rows[1]["text"] == "call <PHONE> ok"
        assert rows[1]["n_phones"] == 1
        assert rows[2]["text"] == "nothing sensitive"
        assert rows[2]["n_emails"] == 0 and rows[2]["n_phones"] == 0


class TestRepSignals:
    def _run(self, texts, ids=None):
        from textalyzer_ray.pipelines.curation import rep_signals

        ids = ids or list(range(len(texts)))
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
        )
        return {r["doc_id"]: r for r in rep_signals(ds).take_all()}

    def test_duplicate_lines_counted_beyond_first(self):
        # "spam spam" appears 3 times -> 2 duplicate occurrences of 9 chars
        r = self._run(["spam spam\nunique line\nspam spam\nspam spam"])[0]
        assert r["n_lines"] == 4
        assert r["dup_line_count"] == 2
        assert r["dup_line_chars"] == 2 * len("spam spam")

    def test_top_bigram_and_tie_break(self):
        # "a b" x2 and "b a" x2 tie on count -> lexicographically smaller wins
        r = self._run(["a b a b a"])[0]
        assert r["top_bigram"] == "a b"
        assert r["top_bigram_count"] == 2

    def test_dup5_excess(self):
        # a 6-token phrase repeated twice -> 2 repeated 5-grams, 1 extra
        # occurrence each
        phrase = "one two three four five six"
        r = self._run([phrase + " stop " + phrase])[0]
        assert r["dup5_excess"] == 2
        # 13 tokens: 20*2 > 3*(13-4), so half-the-doc repetition
        # correctly fails the 0.15 duplicate-5-gram rule
        assert r["kept"] == 0

    def test_heavy_repetition_fails_kept(self):
        r = self._run(["junk line\n" * 10 + "junk line"])[0]
        assert r["dup_line_count"] == 10
        assert r["kept"] == 0

    def test_empty_and_tokenless_docs(self):
        rows = self._run(["", "!!! ???"])
        assert rows[0]["n_lines"] == 0 and rows[0]["n_tokens"] == 0
        assert rows[0]["kept"] == 1  # nothing repeated -> passes
        assert rows[1]["n_tokens"] == 0 and rows[1]["top_bigram"] == ""

    def test_matches_pure_python_oracle(self):
        from collections import Counter

        from textalyzer_ray.core.textmetrics import split_lines, tokenize

        texts = [
            "the cat sat on the mat the cat sat again",
            "alpha beta\nalpha beta\ngamma delta",
            "x",
        ]
        rows = self._run(texts)
        for i, text in enumerate(texts):
            r = rows[i]
            lines = split_lines(text)
            lc = Counter(lines)
            assert r["n_lines"] == len(lines)
            assert r["dup_line_count"] == sum(c - 1 for c in lc.values())
            assert r["dup_line_chars"] == sum(
                (c - 1) * len(l) for l, c in lc.items()
            )
            toks = tokenize(text)
            assert r["n_tokens"] == len(toks)
            bigrams = Counter(
                " ".join(toks[j : j + 2]) for j in range(len(toks) - 1)
            )
            if bigrams:
                top = min(
                    bigrams, key=lambda g: (-bigrams[g], g)
                )
                assert (r["top_bigram"], r["top_bigram_count"]) == (
                    top,
                    bigrams[top],
                )
            fives = Counter(
                " ".join(toks[j : j + 5]) for j in range(len(toks) - 4)
            )
            assert r["dup5_excess"] == sum(c - 1 for c in fives.values())


class TestDupNgramCoverage:
    @staticmethod
    def _docs():
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                    "text": [
                        "the quick brown fox jumps over the lazy dog",
                        "THE QUICK BROWN cat naps all day long",
                        "something entirely different here now ok",
                        "hi",  # < 3 tokens -> all-zero row, kept
                        "the quick brown fox again the quick brown fox",
                    ],
                }
            )
        ).materialize()

    # hand-computed: "the quick brown" is in docs 1/2/5 (twice in 5),
    # "quick brown fox" in 1/5 (twice in 5); doc 2's tokenizer lowers
    # THE QUICK BROWN onto doc 1's grams
    WANT = [
        (1, 7, 7, 2, 2, 1),
        (2, 6, 6, 1, 1, 1),
        (3, 4, 4, 0, 0, 1),
        (4, 0, 0, 0, 0, 1),
        (5, 7, 5, 4, 2, 1),
    ]
    COLS = ["doc_id", "n_grams", "n_distinct", "dup_grams", "dup_distinct", "kept"]

    def _rows(self, ds):
        return [tuple(r[c] for c in self.COLS) for r in ds.sort("doc_id").take_all()]

    def test_broadcast_path_exact(self):
        from textalyzer_ray.pipelines.curation import dup_ngram_coverage

        assert self._rows(dup_ngram_coverage(self._docs(), n=3)) == self.WANT

    def test_distributed_path_equals_broadcast(self):
        """broadcast_threshold=0 forces the gram-aligned grouped path
        (sentinel rows carry the zero-gram doc through the merges)."""
        from textalyzer_ray.pipelines.curation import dup_ngram_coverage

        got = self._rows(
            dup_ngram_coverage(self._docs(), n=3, broadcast_threshold=0)
        )
        assert got == self.WANT

    def test_no_cross_doc_duplication(self):
        from textalyzer_ray.pipelines.curation import dup_ngram_coverage

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": ["aa bb cc dd", "ee ff gg hh"],
                }
            )
        ).materialize()
        got = self._rows(dup_ngram_coverage(ds, n=3))
        assert got == [(0, 2, 2, 0, 0, 1), (1, 2, 2, 0, 0, 1)]

    def test_kept_rule_threshold(self):
        """A doc fully covered by shared grams fails the 0.70 rule."""
        from textalyzer_ray.pipelines.curation import dup_ngram_coverage

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": [
                        "one two three four",
                        "one two three four",
                        "unrelated words entirely here",
                    ],
                }
            )
        ).materialize()
        got = self._rows(dup_ngram_coverage(ds, n=3))
        assert got == [
            (0, 2, 2, 2, 2, 0),
            (1, 2, 2, 2, 2, 0),
            (2, 2, 2, 0, 0, 1),
        ]


class TestBoilerplateRemoval:
    def _lines(self, rows):
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "line_number": pa.array([r[1] for r in rows], pa.int64()),
                    "content": pa.array([r[2] for r in rows], pa.string()),
                    "source": pa.array([r[3] for r in rows], pa.string()),
                }
            )
        )

    def test_drops_all_occurrences_above_max_df(self):
        from textalyzer_ray.pipelines.curation import remove_boilerplate_lines

        # "footer" appears in 3 distinct docs (> max_df=2): ALL copies
        # go, including the first (the C4-dedup contrast). "shared"
        # appears in exactly 2 docs: kept everywhere.
        rows = [
            (0, 1, "unique zero", "a"),
            (0, 2, "footer", "a"),
            (1, 1, "shared", "a"),
            (1, 2, "footer", "a"),
            (2, 1, "shared", "a"),
            (2, 2, "footer", "a"),
            (3, 1, "footer", "a"),  # loses its only line -> disappears
        ]
        out = {
            r["doc_id"]: r["text"]
            for r in remove_boilerplate_lines(
                self._lines(rows), max_df=2
            ).take_all()
        }
        assert out == {0: "unique zero", 1: "shared", 2: "shared"}

    def test_group_scoped_frequency(self):
        from textalyzer_ray.pipelines.curation import remove_boilerplate_lines

        # "banner" hits 2 docs in source a and 1 doc in source b: with
        # max_df=1 scoped per source, only the source-a copies drop.
        rows = [
            (0, 1, "banner", "a"),
            (0, 2, "keep zero", "a"),
            (1, 1, "banner", "a"),
            (2, 1, "banner", "b"),
        ]
        out = {
            r["doc_id"]: r["text"]
            for r in remove_boilerplate_lines(
                self._lines(rows), max_df=1, group_col="source"
            ).take_all()
        }
        assert out == {0: "keep zero", 2: "banner"}
        # corpus-wide with the same threshold drops the b copy too
        out2 = {
            r["doc_id"]: r["text"]
            for r in remove_boilerplate_lines(
                self._lines(rows), max_df=1
            ).take_all()
        }
        assert out2 == {0: "keep zero"}

    def test_multiple_hits_in_one_doc_count_once(self):
        from textalyzer_ray.pipelines.curation import remove_boilerplate_lines

        # df is DISTINCT docs: 3 copies inside one doc keep df=1
        rows = [(0, i, "refrain", "a") for i in range(1, 4)] + [
            (0, 4, "tail", "a")
        ]
        out = remove_boilerplate_lines(self._lines(rows), max_df=1).take_all()
        assert out[0]["text"] == "refrain refrain refrain tail"


class TestDupSpanRemoval:
    """dup_span_removal: Lee-et-al-style duplicated-span removal —
    both scale paths vs a brute-force python reference."""

    DOCS = [
        (0, "The quick brown fox jumps over the lazy dog again and again"),
        (1, "A quick brown fox jumps over the lazy cat today"),
        (2, "completely unrelated text with nothing shared at all here"),
        (3, ""),
        (4, "short doc"),
        (5, "the quick brown fox jumps over the lazy dog once more"),
    ]

    @staticmethod
    def _reference(docs, n):
        import re

        def toks(s):
            return [w.lower() for w in re.split(r"[^A-Za-z]+", s) if w]

        grams = {}
        for i, s in docs:
            ws = toks(s)
            for j in range(len(ws) - n + 1):
                grams.setdefault(" ".join(ws[j : j + n]), set()).add(i)
        dup = {g for g, owners in grams.items() if len(owners) >= 2}
        out = {}
        for i, s in docs:
            ws = toks(s)
            cov = set()
            for j in range(len(ws) - n + 1):
                if " ".join(ws[j : j + n]) in dup:
                    cov.update(range(j, j + n))
            kept = " ".join(w for p, w in enumerate(ws) if p not in cov)
            out[i] = (len(ws), len(cov), kept)
        return out

    def _table(self):
        return pa.table(
            {
                "doc_id": pa.array([d[0] for d in self.DOCS], pa.int64()),
                "text": [d[1] for d in self.DOCS],
            }
        )

    @pytest.mark.parametrize("threshold", [20_000_000, 0])
    def test_matches_reference_both_paths(self, threshold):
        from textalyzer_ray.pipelines.curation import dup_span_removal

        want = self._reference(self.DOCS, 5)
        ds = rd.from_arrow(self._table()).materialize()
        rows = (
            dup_span_removal(ds, n=5, broadcast_threshold=threshold)
            .sort("doc_id")
            .take_all()
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["removed_tokens"], r["kept_text"])
            for r in rows
        }
        assert got == want

    def test_overlapping_windows_count_once(self):
        from textalyzer_ray.pipelines.curation import dup_span_removal

        # 8 shared tokens -> 4 overlapping dup 5-grams covering 8
        # positions, not 20
        docs = [
            (0, "alpha beta gamma delta epsilon zeta eta theta TAIL one"),
            (1, "alpha beta gamma delta epsilon zeta eta theta OTHER two"),
        ]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                    "text": [d[1] for d in docs],
                }
            )
        ).materialize()
        rows = dup_span_removal(ds, n=5).sort("doc_id").take_all()
        assert [r["removed_tokens"] for r in rows] == [8, 8]
        assert rows[0]["kept_text"] == "tail one"

    def test_no_duplicates_is_identity_rebuild(self):
        from textalyzer_ray.pipelines.curation import dup_span_removal

        docs = [(0, "every doc here is fully unique text"), (1, "nothing shared")]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                    "text": [d[1] for d in docs],
                }
            )
        ).materialize()
        rows = dup_span_removal(ds, n=5).sort("doc_id").take_all()
        assert all(r["removed_tokens"] == 0 for r in rows)
        assert rows[0]["kept_text"] == "every doc here is fully unique text"


class TestLengthQuantileFilter:
    def _ds(self):
        rows = []
        # lang "aa": token counts 1..8 -> P25 rank ceil(0.25*8)=2 -> cut=2
        for i in range(8):
            rows.append((i, "aa", " ".join(["tok"] * (i + 1))))
        # lang "bb": counts [5,5,9] -> rank ceil(0.75)=1 -> cut=5, all kept
        rows.append((100, "bb", "a b c d e"))
        rows.append((101, "bb", "f g h i j"))
        rows.append((102, "bb", "k l m n o p q r s"))
        return rows, rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "lang": [r[1] for r in rows],
                    "text": [r[2] for r in rows],
                }
            )
        ).materialize()

    def test_per_group_cutoffs(self):
        from textalyzer_ray.pipelines.curation import length_quantile_filter

        rows, ds = self._ds()
        got = length_quantile_filter(ds, q=0.25).sort("doc_id").take_all()
        kept = [r["doc_id"] for r in got]
        # aa: doc 0 (1 token) dropped, docs 1..7 kept; bb: all kept
        assert kept == [1, 2, 3, 4, 5, 6, 7, 100, 101, 102]
        by_id = {r["doc_id"]: r for r in got}
        assert by_id[1]["n_tokens"] == 2
        assert by_id[102]["lang"] == "bb"

    def test_ties_at_cutoff_kept(self):
        from textalyzer_ray.pipelines.curation import length_quantile_filter

        # counts [2,2,2,7]: rank ceil(0.25*4)=1 -> cut=2 -> all kept
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(range(4)), pa.int64()),
                    "lang": ["xx"] * 4,
                    "text": ["a b", "c d", "e f", "g h i j k l m"],
                }
            )
        ).materialize()
        got = length_quantile_filter(ds, q=0.25).sort("doc_id").take_all()
        assert [r["doc_id"] for r in got] == [0, 1, 2, 3]

    def test_median_q(self):
        from textalyzer_ray.pipelines.curation import length_quantile_filter

        # counts 1..4 at q=0.5: rank 2 -> cut=2 -> drop only the 1-token doc
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(range(4)), pa.int64()),
                    "lang": ["xx"] * 4,
                    "text": ["a", "a b", "a b c", "a b c d"],
                }
            )
        ).materialize()
        got = length_quantile_filter(ds, q=0.5).sort("doc_id").take_all()
        assert [r["doc_id"] for r in got] == [1, 2, 3]


class TestNfcClean:
    def _run(self, texts):
        from textalyzer_ray.pipelines.curation import nfc_clean

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                    "text": texts,
                }
            )
        )
        return nfc_clean(ds).sort("doc_id").take_all()

    @staticmethod
    def _reference(s):
        import re
        import unicodedata

        n = unicodedata.normalize("NFC", s)
        n = re.sub(r"[\x00-\x08\x0B-\x1F\x7F]", "", n)
        n = re.sub(r"[ \t]+", " ", n)
        return n

    def test_matches_unicodedata_reference(self):
        texts = [
            "plain ascii",
            "nfd é and composed é",
            "ctrl\x01\x02here\x7f",
            "tabs\t\tand  spaces   collapse",
            "keep\nnewlines\nintact",
            "",
            "Å angstrom and Ａ fullwidth stay NFC-mapped",
        ]
        rows = self._run(texts)
        for r, s in zip(rows, texts):
            want = self._reference(s)
            assert r["clean_text"] == want, s
            assert r["n_raw"] == len(s.encode())
            assert r["n_clean"] == len(want.encode())

    def test_nfd_actually_composes(self):
        rows = self._run(["cafe\u0301"])
        assert rows[0]["clean_text"] == "caf\u00e9"
        assert rows[0]["n_raw"] == 6 and rows[0]["n_clean"] == 5

    def test_newline_survives_control_strip(self):
        rows = self._run(["a\x0bb\nc\td"])
        assert rows[0]["clean_text"] == "ab\nc d"


class TestShardShuffle:
    @staticmethod
    def _reference(ids, n_shards):
        out = {}
        pairs = []
        for i in ids:
            h = ((i % (1 << 32)) * 3266489917) % (1 << 32)
            pairs.append((h % n_shards, h, i))
        for s in range(n_shards):
            members = sorted(p for p in pairs if p[0] == s)
            for r, (_, _, i) in enumerate(members, 1):
                out[i] = (s, r)
        return out

    def test_matches_reference_and_ranks_dense(self):
        from textalyzer_ray.pipelines.curation import shard_shuffle

        ids = list(range(0, 400, 3))
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64())})
        ).materialize()
        rows = shard_shuffle(ds, n_shards=4).sort("doc_id").take_all()
        want = self._reference(ids, 4)
        got = {r["doc_id"]: (r["shard_id"], r["shard_rank"]) for r in rows}
        assert got == want
        # ranks dense 1..n per shard
        import collections

        per = collections.defaultdict(list)
        for i, (s, r) in got.items():
            per[s].append(r)
        for s, rs in per.items():
            assert sorted(rs) == list(range(1, len(rs) + 1))

    def test_partitioning_invariant(self):
        from textalyzer_ray.pipelines.curation import shard_shuffle

        ids = list(range(123))
        t = pa.table({"doc_id": pa.array(ids, pa.int64())})
        one = shard_shuffle(
            rd.from_arrow(t).materialize(), n_shards=8
        ).sort("doc_id").to_pandas()
        many = shard_shuffle(
            rd.from_arrow(t).repartition(9).materialize(), n_shards=8
        ).sort("doc_id").to_pandas()
        assert one.equals(many)

    def test_independent_of_split_hash(self):
        # same ids, different multipliers: shuffle order must not be a
        # monotone image of the split hash (correlation guard)
        from textalyzer_ray.pipelines.curation import _KNUTH, _SHUF_MULT

        assert _SHUF_MULT != _KNUTH
        ids = list(range(1000))
        h1 = [((i % (1 << 32)) * _KNUTH) % (1 << 32) for i in ids]
        h2 = [((i % (1 << 32)) * _SHUF_MULT) % (1 << 32) for i in ids]
        import numpy as np

        r1 = np.argsort(np.argsort(h1))
        r2 = np.argsort(np.argsort(h2))
        corr = float(np.corrcoef(r1, r2)[0, 1])
        assert abs(corr) < 0.1, corr


class TestNfcCleanProperty:
    """Bounded-alphabet fuzz: polars' Rust NFC + regex must equal the
    Python unicodedata reference over the domain the op targets
    (latin + combining accents + controls + whitespace). The alphabet
    is bounded deliberately — exotic new-Unicode codepoints could
    legitimately differ between the engines' UCD versions and are not
    what a web-text cleanup pass sees."""

    ALPHABET = (
        "abcXYZ 123"
        "\t\n\x00\x01\x07\x0b\x1f\x7f"
        "̧́̈"  # combining acute / diaeresis / cedilla
        "eéAÅÅ"  # e, precomposed é, A, Å, angstrom sign
        "Ａﬁ"  # fullwidth A, fi ligature
    )

    def test_fuzz_matches_unicodedata(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from textalyzer_ray.pipelines.curation import nfc_clean

        ref = TestNfcClean._reference

        @settings(max_examples=60, deadline=None)
        @given(
            st.lists(
                st.text(alphabet=self.ALPHABET, max_size=40),
                min_size=1,
                max_size=6,
            )
        )
        def check(texts):
            ds = rd.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array(
                            list(range(len(texts))), pa.int64()
                        ),
                        "text": texts,
                    }
                )
            )
            rows = nfc_clean(ds).sort("doc_id").take_all()
            for r, s in zip(rows, texts):
                want = ref(s)
                assert r["clean_text"] == want, repr(s)
                assert r["n_raw"] == len(s.encode())
                assert r["n_clean"] == len(want.encode())

        check()


class TestBlocklistAudit:
    def test_counts_and_kept(self):
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.curation import blocklist_audit

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": [
                    "clean words only here",
                    "bad Bad BAD word",  # tokenizer lowercases: 3 hits
                    "bad embedded notbad badge",  # token-exact: 1 hit
                    "",
                ],
            }
        )
        got = (
            blocklist_audit(rd.from_arrow(t).repartition(3), ["bad", "worse"])
            .sort("doc_id")
            .take_all()
        )
        assert got == [
            {"doc_id": 0, "n_hits": 0, "kept": 1},
            {"doc_id": 1, "n_hits": 3, "kept": 0},
            {"doc_id": 2, "n_hits": 1, "kept": 0},
            {"doc_id": 3, "n_hits": 0, "kept": 1},
        ]

    def test_empty_dataset(self):
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.curation import blocklist_audit

        t = pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
        assert blocklist_audit(rd.from_arrow(t), ["x"]).take_all() == []


class TestNoveltyScores:
    def test_first_owner_and_fractions(self, ray_session):
        """doc0 plants 'a b c d' (grams: 'a b c','b c d' — both new);
        doc1 repeats 'a b c' and adds 'c d e' -> grams {'a b c','b c d'?
        no: text 'a b c e' -> grams 'a b c' (old), 'b c e' (new) ->
        novelty 1/2; doc2 is a pure copy of doc0 -> novelty 0; doc3 is
        2 tokens -> excluded."""
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.curation import novelty_scores

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["a b c d", "a b c e", "a b c d", "a b"], pa.string()
                ),
            }
        )
        out = novelty_scores(rd.from_arrow(t).repartition(3), n=3).take_all()
        got = {r["doc_id"]: r for r in out}
        assert set(got) == {0, 1, 2}
        assert got[0]["n_distinct"] == 2 and got[0]["n_new"] == 2
        assert got[0]["novelty"] == 1.0
        assert got[1]["n_distinct"] == 2 and got[1]["n_new"] == 1
        assert got[1]["novelty"] == 0.5
        assert got[2]["n_new"] == 0 and got[2]["novelty"] == 0.0

    def test_within_doc_repeats_count_once(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.curation import novelty_scores

        t = pa.table(
            {
                "doc_id": pa.array([5], pa.int64()),
                "text": pa.array(["x y z x y z x y z"], pa.string()),
            }
        )
        out = novelty_scores(rd.from_arrow(t), n=3).take_all()
        # grams: x y z, y z x, z x y (each repeated) -> 3 distinct, all new
        assert out == [
            {"doc_id": 5, "n_distinct": 3, "n_new": 3, "novelty": 1.0}
        ]


class TestSourceOverlap:
    def test_hand_case(self, ray_session):
        """srcA docs: 'a b c d' (grams abc,bcd), 'x y z w' (xyz,yzw);
        srcB: 'a b c q' (abc,bcq); srcC: 'p q r s' (pqr,qrs — disjoint).
        Pairs: (A,B) share {abc}: n_shared=1, n_a=4, n_b=2,
        containment 1/2. C pairs with nobody."""
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.curation import source_overlap

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "source": pa.array(["srcA", "srcA", "srcB", "srcC"]),
                "text": pa.array(
                    ["a b c d", "x y z w", "a b c q", "p q r s"]
                ),
            }
        )
        out = source_overlap(rd.from_arrow(t).repartition(3), n=3).take_all()
        assert out == [
            {
                "source_a": "srcA",
                "source_b": "srcB",
                "n_shared": 1,
                "n_a": 4,
                "n_b": 2,
                "containment": 0.5,
            }
        ]

    def test_no_cross_doc_grams(self, ray_session):
        """Two one-gram docs of the same source in ONE batch must not
        form grams across the doc boundary: 'a b c' + 'd e f' share
        nothing with a source whose doc is 'c d e' (the cross-doc gram
        'b c d'/'c d e' must NOT exist for the first source)."""
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.curation import source_overlap

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "source": pa.array(["s1", "s1", "s2"]),
                "text": pa.array(["a b c", "d e f", "c d e"]),
            }
        )
        out = source_overlap(rd.from_arrow(t), n=3).take_all()
        assert out == []


class TestCoverageSelect:
    def _corpus(self):
        import pyarrow as pa

        return pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "a b c d e",      # grams abc bcd cde (3)
                        "a b c d e f g",  # abc bcd cde def efg (5)
                        "x y z w",        # xyz yzw (2)
                        "a b c",          # abc (0 new after doc1)
                    ]
                ),
            }
        )

    def test_greedy_order_and_early_stop(self, ray_session):
        """Round 1 picks doc1 (5 grams); round 2 doc2 (+2); round 3:
        doc0 and doc3 have 0 uncovered -> stop at 2 rows."""
        import ray.data as rd

        from textalyzer_ray.pipelines.curation import coverage_select

        out = coverage_select(
            rd.from_arrow(self._corpus()).repartition(3), k=6
        ).take_all()
        assert out == [
            {"round": 1, "doc_id": 1, "gain": 5, "covered": 5},
            {"round": 2, "doc_id": 2, "gain": 2, "covered": 7},
        ]

    def test_distributed_path_equals_small_path(self, ray_session):
        import ray.data as rd

        from textalyzer_ray.pipelines.curation import coverage_select

        small = coverage_select(
            rd.from_arrow(self._corpus()).repartition(3), k=6
        ).take_all()
        dist = coverage_select(
            rd.from_arrow(self._corpus()).repartition(3),
            k=6,
            small_threshold=0,
        ).take_all()
        assert small == dist

    def test_tie_breaks_to_lowest_id(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.curation import coverage_select

        t = pa.table(
            {
                "doc_id": pa.array([7, 2], pa.int64()),
                "text": pa.array(["a b c d", "p q r s"]),
            }
        )
        out = coverage_select(rd.from_arrow(t), k=1).take_all()
        assert out == [{"round": 1, "doc_id": 2, "gain": 2, "covered": 2}]
