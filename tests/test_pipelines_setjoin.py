"""Exact set-similarity join (AllPairs/PPJoin prefix filter):
brute-force equivalence (recall-1 guarantee), broadcast==distributed
df-path equality, conservative integer prefix bound, oracle margin."""

from fractions import Fraction

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.core.fingerprint import jaccard
from textalyzer_ray.core.textmetrics import tokenize
from textalyzer_ray.pipelines.setjoin import _T_DEN, _ceil_tn, set_similarity_join

pytestmark = pytest.mark.usefixtures("quiet_data_context")


def brute_pairs(ids, texts, threshold, k=3):
    toks = {i: tokenize(x or "") for i, x in zip(ids, texts)}
    out = []
    s = sorted(ids)
    for i in range(len(s)):
        for j in range(i + 1, len(s)):
            jj = jaccard(toks[s[i]], toks[s[j]], k)
            if jj >= threshold:
                out.append((s[i], s[j], jj))
    return out


def run(tbl, threshold, **kw):
    got = (
        set_similarity_join(rd.from_arrow(tbl).repartition(4), threshold, **kw)
        .sort(["id_a", "id_b"])
        .take_all()
    )
    return [(r["id_a"], r["id_b"], r["jaccard"]) for r in got]


def _aug_docs():
    import __ray_entry__ as entry

    t = pa.concat_tables(
        list(
            entry._augmented_docs("/root/testdata/sf0.001").iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
        )
    )
    return t


class TestSetSimilarityJoin:
    def test_matches_brute_force_sf0001(self):
        t = _aug_docs()
        exp = brute_pairs(t["doc_id"].to_pylist(), t["text"].to_pylist(), 0.8)
        got = run(t.select(["doc_id", "text"]), 0.8)
        assert got == exp  # ids AND float jaccard bit-equal

    def test_oracle_margin_sf0001(self):
        """min |jaccard - 0.8| over ALL pairs (matched and not) must
        beat double rounding by orders of magnitude — the r3 float-
        oracle protocol. Measured 0.0636 at sf0.001, 0.0571 at sf0.01."""
        t = _aug_docs()
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        toks = {i: tokenize(x or "") for i, x in zip(ids, texts)}
        gap = 1.0
        s = sorted(ids)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                jj = jaccard(toks[s[i]], toks[s[j]], 3)
                if jj > 0:
                    gap = min(gap, abs(jj - 0.8))
        assert gap > 0.05, gap

    def test_all_three_paths_equal(self):
        t = _aug_docs().select(["doc_id", "text"])
        a = run(t, 0.8)  # one-task small path (default thresholds)
        b = run(t, 0.8, small_threshold=0)  # broadcast df, dist exchanges
        c = run(t, 0.8, small_threshold=0, df_broadcast_max=0)  # union-tag df
        assert a == b == c and len(a) > 0

    @pytest.mark.parametrize("threshold", [0.5, 0.7, 1.0])
    def test_random_corpus_thresholds(self, threshold):
        """Seeded random corpus with planted near-dups: recall-1 at
        several thresholds, including exact-dup-only t=1.0."""
        import random

        rng = random.Random(7)
        vocab = [f"tok{c}" for c in "abcdefghijklmnop"]
        texts = []
        for _ in range(40):
            n = rng.randint(1, 12)
            texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
        # planted: exact dup, one-token edit, disjoint doc
        texts += [texts[0], texts[1] + " tokq", "zzz yyy xxx www"]
        ids = list(range(len(texts)))
        t = pa.table({"doc_id": ids, "text": texts})
        assert run(t, threshold) == brute_pairs(ids, texts, threshold)

    def test_empty_and_degenerate_docs(self):
        t = pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["", "", "only one tok", "only one tok"],
            }
        )
        # empty shingle sets never pair (oracle has no grams for them);
        # identical docs pair at jaccard 1.0
        assert run(t, 0.8) == [(3, 4, 1.0)]

    def test_prefix_bound_is_conservative(self):
        """The integer prefix bound must never exceed the exact rational
        ceil(t*n) — a longer prefix is safe, a shorter one silently
        loses recall (float ceil(0.7*20) == 15 is the trap)."""
        for tf in (0.5, 0.7, 0.8, 0.9, 1.0, 1 / 3):
            t_num = int(tf * _T_DEN)
            frac = Fraction(t_num, _T_DEN)
            for n in list(range(1, 200)) + [10**6, 10**9]:
                exact = -(-(frac.numerator * n) // frac.denominator)
                assert _ceil_tn(t_num, n) == exact
                # and the rational never exceeds the float threshold
            assert float(frac) <= tf

    def test_threshold_validation(self):
        t = pa.table({"doc_id": [1], "text": ["a b c"]})
        with pytest.raises(ValueError):
            set_similarity_join(rd.from_arrow(t), 0.0)


class TestContainmentJoin:
    """Asymmetric |Sa n Sb|/|Sa| join: brute-force equivalence on all
    three paths, subset semantics, thresholds incl. exact (1.0)."""

    @staticmethod
    def brute(ids, texts, t, k=3):
        from textalyzer_ray.core.fingerprint import shingles

        sets = {i: set(shingles(tokenize(x or ""), k)) for i, x in zip(ids, texts)}
        out = []
        for a in sorted(ids):
            for b in sorted(ids):
                if a == b or not sets[a]:
                    continue
                c = len(sets[a] & sets[b]) / len(sets[a])
                if c >= t:
                    out.append((a, b, c))
        return out

    @staticmethod
    def run(tbl, threshold, **kw):
        from textalyzer_ray.pipelines.setjoin import containment_join

        got = (
            containment_join(rd.from_arrow(tbl).repartition(4), threshold, **kw)
            .sort(["id_a", "id_b"])
            .take_all()
        )
        return [(r["id_a"], r["id_b"], r["containment"]) for r in got]

    @pytest.mark.parametrize("threshold", [0.6, 0.8, 1.0])
    def test_random_corpus_all_paths(self, threshold):
        import random

        rng = random.Random(5)
        vocab = [f"tok{c}" for c in "abcdefghij"]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 15)))
            for _ in range(35)
        ]
        # planted: exact dup, strict prefix subset, empty, extension
        texts += [
            texts[0],
            " ".join(texts[1].split()[:4]),
            "",
            texts[2] + " extra tail tokens here",
        ]
        ids = list(range(len(texts)))
        t = pa.table({"doc_id": ids, "text": texts})
        exp = self.brute(ids, texts, threshold)
        assert self.run(t, threshold) == exp
        assert self.run(t, threshold, small_threshold=0) == exp
        assert (
            self.run(t, threshold, small_threshold=0, df_broadcast_max=0)
            == exp
        )

    def test_subset_scores_one_even_at_low_jaccard(self):
        # LETTERS-ONLY tokens: the tokenizer splits on non-letters, so
        # "w0".."w39" would all collapse to the token "w" (CLAUDE.md)
        words = [f"{chr(97 + i // 26)}{chr(97 + i % 26)}x" for i in range(40)]
        big = " ".join(words)
        small = " ".join(words[:8])  # prefix subset
        t = pa.table({"doc_id": [1, 2], "text": [big, small]})
        got = self.run(t, 0.9)
        # small -> big containment is exactly 1.0; big -> small is low
        assert got == [(2, 1, 1.0)]

    def test_matches_brute_on_augmented_sf0001(self):
        t = _aug_docs()
        exp = self.brute(t["doc_id"].to_pylist(), t["text"].to_pylist(), 0.8)
        got = self.run(t.select(["doc_id", "text"]), 0.8)
        assert got == exp and len(got) > 0
