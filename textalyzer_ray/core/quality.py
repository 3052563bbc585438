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
