"""Unit tests for readability, langid, quality, fingerprint cores."""

import numpy as np
import pytest

from textalyzer_ray.core.fingerprint import (
    hamming64,
    jaccard,
    lsh_band_keys,
    minhash_params,
    minhash_signature,
    shingles,
    simhash64,
    stable_hash_u64,
    winnowed_fingerprints,
)
from textalyzer_ray.core.langid import detect_language
from textalyzer_ray.core.quality import quality_components, quality_score
from textalyzer_ray.core.readability import (
    count_sentences,
    count_syllables_word,
    flesch_kincaid_grade,
    flesch_reading_ease,
    text_stats,
)


class TestReadability:
    @pytest.mark.parametrize(
        "word,syll",
        [
            ("cat", 1),
            ("table", 2),
            ("make", 1),
            ("reading", 2),
            ("syllable", 3),
            ("the", 1),
            ("a", 1),
            ("people", 2),
            ("coffee", 2),
        ],
    )
    def test_syllables(self, word, syll):
        assert count_syllables_word(word) == syll

    def test_sentences(self):
        assert count_sentences("One. Two! Three?") == 3
        assert count_sentences("no terminator") == 1
        assert count_sentences("") == 0

    def test_flesch_hand_vector(self):
        # "The cat sat." -> 3 words, 1 sentence, 3 syllables
        assert text_stats("The cat sat.") == (3, 1, 3)
        expected = 206.835 - 1.015 * 3 - 84.6 * 1.0
        assert flesch_reading_ease("The cat sat.") == pytest.approx(expected)
        expected_g = 0.39 * 3 + 11.8 * 1.0 - 15.59
        assert flesch_kincaid_grade("The cat sat.") == pytest.approx(expected_g)

    def test_empty(self):
        assert flesch_reading_ease("") == 0.0
        assert flesch_kincaid_grade("123") == 0.0


class TestLangId:
    def test_en(self):
        assert detect_language("the quick brown fox is on the hill and it was good") == "en"

    def test_de(self):
        assert detect_language("das ist ein gutes Beispiel und der Hund ist nicht da") == "de"

    def test_fr(self):
        assert detect_language("le chat est dans la maison et il ne dort pas") == "fr"

    def test_es(self):
        assert detect_language("el perro está en la casa y no es un gato") == "es"

    def test_zh(self):
        assert detect_language("今天天气很好我们去公园散步") == "zh"

    def test_unknown(self):
        assert detect_language("") == "unknown"
        assert detect_language("xyzzy plugh qwerty") == "unknown"


class TestQuality:
    def test_components_integers(self):
        c = quality_components("The cat sat on the mat.")
        assert c["n_tokens"] == 6
        assert c["n_stopwords"] == 3  # the, on, the
        assert c["total_token_chars"] == 17
        assert c["n_lines"] == 1

    def test_score_bounds_and_monotonic(self):
        good = "The cat sat on the mat and it was a very good day for all of us. " * 3
        bad = "x9 #$% 77"
        assert 0.0 <= quality_score(bad) < quality_score(good) <= 1.0
        assert quality_score("") == 0.0


class TestFingerprint:
    def test_stable_hash_deterministic(self):
        assert stable_hash_u64("abc") == stable_hash_u64(b"abc")
        assert stable_hash_u64("abc") != stable_hash_u64("abd")

    def test_shingles(self):
        assert shingles(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
        assert shingles(["a"], 3) == ["a"]
        assert shingles([], 3) == []

    def test_minhash_similarity_reflects_jaccard(self):
        a, b = minhash_params(128)
        t1 = ("the quick brown fox jumps over the lazy dog " * 5).split()
        t2 = list(t1)
        t2[7] = "sleepy"  # near-duplicate
        t3 = ("completely different content about ray data pipelines " * 5).split()
        s1 = minhash_signature(t1, 3, a, b)
        s2 = minhash_signature(t2, 3, a, b)
        s3 = minhash_signature(t3, 3, a, b)
        sim12 = float(np.mean(s1 == s2))
        sim13 = float(np.mean(s1 == s3))
        assert sim12 > 0.5 > sim13
        # and LSH bands collide for near-dups
        k12 = set(lsh_band_keys(s1, 16)) & set(lsh_band_keys(s2, 16))
        k13 = set(lsh_band_keys(s1, 16)) & set(lsh_band_keys(s3, 16))
        assert k12 and not k13

    def test_jaccard(self):
        assert jaccard(["a", "b"], ["a", "b"], 2) == 1.0
        assert jaccard(["a", "b"], ["c", "d"], 2) == 0.0

    def test_simhash_near_dup_low_hamming(self):
        from textalyzer_ray.core.textmetrics import frequency_map

        t1 = frequency_map("the quick brown fox jumps over the lazy dog " * 10)
        t2 = frequency_map("the quick brown fox jumps over the sleepy dog " * 10)
        t3 = frequency_map("ray data streaming executor shuffles arrow blocks " * 10)
        h1, h2, h3 = simhash64(t1), simhash64(t2), simhash64(t3)
        assert hamming64(h1, h2) < hamming64(h1, h3)
        assert hamming64(h1, h1) == 0

    def test_winnowing_deterministic_and_shared(self):
        t1 = "some reasonably long text about winnowing fingerprints for documents"
        fp1 = winnowed_fingerprints(t1)
        assert fp1 == winnowed_fingerprints(t1)
        # shares fingerprints with a doc containing the same substring
        fp2 = winnowed_fingerprints("prefix " + t1 + " suffix")
        assert set(fp1) & set(fp2)
        assert winnowed_fingerprints("") == []


class TestGopherRules:
    def test_boundaries_integer_exact(self):
        from textalyzer_ray.core.quality import gopher_rules

        # exactly 50 words of 3 chars with 2 required stopwords -> kept
        words = ["the", "and"] + ["fox"] * 48
        r = gopher_rules(" ".join(words))
        assert r["n_words"] == 50 and r["kept"] == 1, r
        # 49 words fails the count rule only
        r49 = gopher_rules(" ".join(words[:-1]))
        assert r49["r_word_count"] == 0 and r49["kept"] == 0

    def test_symbol_boundary(self):
        from textalyzer_ray.core.quality import gopher_rules

        base = ["the", "and"] + ["fox"] * 48
        # 5 '#' in 50 words -> 5*10 <= 50 passes; 6 fails
        ok = gopher_rules(" ".join(base) + " #####")
        assert ok["r_symbol_ratio"] == 1
        bad = gopher_rules(" ".join(base) + " ######")
        assert bad["r_symbol_ratio"] == 0

    def test_bullet_and_ellipsis_lines(self):
        from textalyzer_ray.core.quality import gopher_rules

        bullets = "\n".join("- item %d" % i for i in range(10))
        assert gopher_rules(bullets)["r_bullet_lines"] == 0  # 10/10 >= 0.9
        dots = "\n".join(["plain line", "tail...", "tail..."])
        assert gopher_rules(dots)["r_ellipsis_lines"] == 0  # 2/3 >= 0.3

    def test_stopword_punctuation_stripping(self):
        from textalyzer_ray.core.quality import gopher_rules

        r = gopher_rules('The, with! ' + " ".join(["word"] * 60))
        assert r["r_stopwords"] == 1
