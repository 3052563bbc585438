"""Document quality scoring for training-data curation.

Extension beyond the reference (SURVEY.md: training-pipeline operations).
All signals are deterministic pure functions of the text; integer
components are exposed separately (``quality_components``) so the driver's
DuckDB oracle can check them exactly, while the composite float score is
covered by a rows-only check.

Signals (C4/Gopher-style public heuristics):
- n_tokens, mean word length
- stopword ratio (English function words)
- punctuation ratio, digit ratio, uppercase ratio
- max line length / short-line fraction (boilerplate smell)
"""

from __future__ import annotations

from textalyzer_ray.core.langid import PROFILES
from textalyzer_ray.core.textmetrics import split_lines, tokenize

STOPWORDS = PROFILES["en"]


def quality_components(text: str) -> dict[str, int]:
    """Integer signal components (SQL-checkable)."""
    toks = tokenize(text)
    return {
        "n_tokens": len(toks),
        "n_stopwords": sum(1 for t in toks if t in STOPWORDS),
        "total_token_chars": sum(len(t) for t in toks),
        "n_lines": len(split_lines(text)),
        "n_chars": len(text),
    }


def quality_score_from(toks: list[str], text: str) -> float:
    """Composite score from pre-computed tokens (single source of truth
    for both the oracle and the combined DocScorer stage)."""
    n = len(toks)
    if n == 0:
        return 0.0
    stop_ratio = sum(1 for t in toks if t in STOPWORDS) / n
    mean_len = sum(len(t) for t in toks) / n
    alpha_chars = sum(1 for ch in text if ch.isalpha())
    alpha_ratio = alpha_chars / max(len(text), 1)

    score = 0.0
    # enough content
    score += 0.25 * min(n / 50.0, 1.0)
    # function words present (natural language, not keyword spam)
    score += 0.25 * min(stop_ratio / 0.2, 1.0)
    # plausible word lengths (3..10)
    score += 0.25 * (1.0 if 3.0 <= mean_len <= 10.0 else 0.5 if 2.0 <= mean_len <= 12.0 else 0.0)
    # mostly letters
    score += 0.25 * min(alpha_ratio / 0.6, 1.0)
    return round(score, 6)


def quality_score(text: str) -> float:
    """Composite [0,1] quality score, higher = more natural-language-like.

    Deterministic combination of: token count band, stopword ratio band,
    mean token length band, alpha ratio.
    """
    return quality_score_from(tokenize(text), text)


# --- Gopher-style rule filter (Rae et al. 2021, public heuristics) ---

import re as _re

# whitespace class shared bit-for-bit with the SQL oracle's regexp_split
# (python \s adds \x0b and unicode spaces RE2/DuckDB \s lacks)
_WS_SPLIT = _re.compile(r"[ \t\n\r\f]+")
_ALPHA_ASCII = _re.compile(r"[A-Za-z]")

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(text: str) -> dict[str, int]:
    """Integer/boolean Gopher-filter signals, every one expressible in
    ANSI SQL so the driver's DuckDB oracle checks the whole rule set:

    - r_word_count:     50 <= n_words <= 100_000
    - r_mean_word_len:  3 <= mean chars/word <= 10
    - r_symbol_ratio:   ('#' chars + '...' occurrences) / n_words <= 0.1
    - r_bullet_lines:   < 90% of lines start with '-' or '*'
    - r_ellipsis_lines: < 30% of lines end with '...'
    - r_alpha_words:    >= 80% of words contain an ASCII letter
      (ASCII class on BOTH sides — corpus policy, documented)
    - r_stopwords:      >= 2 distinct required stopwords present
    - kept: all of the above
    """
    words = [w for w in _WS_SPLIT.split(text) if w]
    n = len(words)
    lines = text.split("\n")
    n_lines = max(len(lines), 1)
    sum_chars = sum(len(w) for w in words)
    symbols = text.count("#") + text.count("...")
    # explicit strip charsets mirror the SQL oracle's trim/ltrim args
    bullet = sum(1 for l in lines if l.lstrip(" \t\r\f").startswith(("-", "*")))
    ellipsis = sum(1 for l in lines if l.rstrip(" \t\r\f").endswith("..."))
    alpha = sum(1 for w in words if _ALPHA_ASCII.search(w))
    stops = {w.lower().strip(".,;:!?\"'") for w in words} & set(GOPHER_STOPWORDS)

    # all comparisons in INTEGER arithmetic so the SQL oracle agrees at
    # the exact rule boundaries (0.1*n in float is not n/10)
    r = {
        "n_words": n,
        "r_word_count": int(50 <= n <= 100_000),
        "r_mean_word_len": int(n > 0 and 3 * n <= sum_chars <= 10 * n),
        "r_symbol_ratio": int(n > 0 and symbols * 10 <= n),
        "r_bullet_lines": int(bullet * 10 < 9 * n_lines),
        "r_ellipsis_lines": int(ellipsis * 10 < 3 * n_lines),
        "r_alpha_words": int(n > 0 and alpha * 5 >= 4 * n),
        "r_stopwords": int(len(stops) >= 2),
    }
    r["kept"] = int(all(v for k, v in r.items() if k.startswith("r_")))
    return r
