"""Readability scoring: syllable counting + Flesch reading ease /
Flesch-Kincaid grade level.

New capability relative to the reference CLI (its Cargo description
promises "readability, and complexity" and it ships an unused
letter-frequency table, languages/english/relative-character-frequency.tsv,
but no scorer — see SURVEY.md §2.3). Formulas are the published ones:

  reading_ease = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)
  grade        = 0.39*(words/sentences) + 11.8*(syllables/words) - 15.59

Everything is deterministic pure Python; the distributed stage applies
these functions per row inside an actor pool.
"""

from __future__ import annotations

import re

from textalyzer_ray.core.textmetrics import tokenize

_VOWELS = set("aeiouy")
_SENTENCE_END = re.compile(r"[.!?]+")


def count_syllables_word(word: str) -> int:
    """Heuristic English syllable count for one lowercase word:
    count vowel groups, subtract silent trailing 'e' (but keep '-le'
    after a consonant, e.g. 'table'), minimum 1."""
    w = word.lower()
    if not w:
        return 0
    groups = 0
    prev_vowel = False
    for ch in w:
        is_vowel = ch in _VOWELS
        if is_vowel and not prev_vowel:
            groups += 1
        prev_vowel = is_vowel
    if w.endswith("e") and not w.endswith(("le", "ee", "ie", "oe", "ye")):
        if groups > 1:
            groups -= 1
    return max(groups, 1)


def count_sentences(text: str) -> int:
    """Number of sentence-terminator runs ([.!?]+) with at least one
    preceding non-space char; minimum 1 when there is any text."""
    if not text.strip():
        return 0
    n = len(_SENTENCE_END.findall(text))
    return max(n, 1)


def text_stats(text: str) -> tuple[int, int, int]:
    """(n_words, n_sentences, n_syllables) using the reference tokenizer
    for words (frequency.rs:34-45 semantics)."""
    words = tokenize(text)
    n_words = len(words)
    n_sent = count_sentences(text)
    n_syll = sum(count_syllables_word(w) for w in words)
    return n_words, n_sent, n_syll


def flesch_reading_ease(text: str) -> float:
    n_words, n_sent, n_syll = text_stats(text)
    if n_words == 0 or n_sent == 0:
        return 0.0
    return 206.835 - 1.015 * (n_words / n_sent) - 84.6 * (n_syll / n_words)


def flesch_kincaid_grade(text: str) -> float:
    n_words, n_sent, n_syll = text_stats(text)
    if n_words == 0 or n_sent == 0:
        return 0.0
    return 0.39 * (n_words / n_sent) + 11.8 * (n_syll / n_words) - 15.59
