"""Per-document analysis stages (actor pools).

Each class is a ``map_batches`` callable: stateful setup (stopword sets,
language profiles, minhash permutation tables) happens once per actor in
``__init__``; ``__call__`` processes an Arrow batch. The per-document
work (syllable counting, langid scoring) is inherently per-row Python —
the parallelism is the actor pool, the batch interface stays Arrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from textalyzer_ray.core.langid import detect_language
from textalyzer_ray.core.quality import quality_components, quality_score
from textalyzer_ray.core.readability import text_stats


class DocScorer:
    """Combined readability + quality scorer (one actor pool, one
    tokenization pass per document — two chained pools would pay pool
    spin-up and tokenize twice)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from textalyzer_ray.core.quality import STOPWORDS, quality_score_from
        from textalyzer_ray.core.readability import (
            count_sentences,
            count_syllables_word,
        )
        from textalyzer_ray.core.textmetrics import split_lines, tokenize

        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        cols = {
            "n_words": np.zeros(n, np.int64),
            "n_sentences": np.zeros(n, np.int64),
            "n_syllables": np.zeros(n, np.int64),
            "flesch_reading_ease": np.zeros(n, np.float64),
            "flesch_kincaid_grade": np.zeros(n, np.float64),
            "n_tokens": np.zeros(n, np.int64),
            "n_stopwords": np.zeros(n, np.int64),
            "total_token_chars": np.zeros(n, np.int64),
            "n_lines": np.zeros(n, np.int64),
            "quality_score": np.zeros(n, np.float64),
        }
        for i, t in enumerate(texts):
            t = t or ""
            toks = tokenize(t)
            w = len(toks)
            s = count_sentences(t)
            y = sum(count_syllables_word(x) for x in toks)
            cols["n_words"][i] = cols["n_tokens"][i] = w
            cols["n_sentences"][i] = s
            cols["n_syllables"][i] = y
            if w and s:
                cols["flesch_reading_ease"][i] = (
                    206.835 - 1.015 * (w / s) - 84.6 * (y / w)
                )
                cols["flesch_kincaid_grade"][i] = (
                    0.39 * (w / s) + 11.8 * (y / w) - 15.59
                )
            n_stop = sum(1 for x in toks if x in STOPWORDS)
            total_chars = sum(len(x) for x in toks)
            cols["n_stopwords"][i] = n_stop
            cols["total_token_chars"][i] = total_chars
            cols["n_lines"][i] = len(split_lines(t))
            cols["quality_score"][i] = quality_score_from(toks, t)
        out = batch
        for name, arr in cols.items():
            out = out.append_column(name, pa.array(arr))
        return out


class ReadabilityScorer:
    """Append n_words, n_sentences, n_syllables, flesch_reading_ease,
    flesch_kincaid_grade (formulas in core.readability)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        n_words = np.zeros(n, np.int64)
        n_sent = np.zeros(n, np.int64)
        n_syll = np.zeros(n, np.int64)
        ease = np.zeros(n, np.float64)
        grade = np.zeros(n, np.float64)
        for i, t in enumerate(texts):
            t = t or ""
            w, s, y = text_stats(t)
            n_words[i], n_sent[i], n_syll[i] = w, s, y
            if w and s:
                ease[i] = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
                grade[i] = 0.39 * (w / s) + 11.8 * (y / w) - 15.59
        return (
            batch.append_column("n_words", pa.array(n_words))
            .append_column("n_sentences", pa.array(n_sent))
            .append_column("n_syllables", pa.array(n_syll))
            .append_column("flesch_reading_ease", pa.array(ease))
            .append_column("flesch_kincaid_grade", pa.array(grade))
        )


class LanguageDetector:
    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = [detect_language(t or "") for t in batch[self.text_col].to_pylist()]
        return batch.append_column(self.out_col, pa.array(langs, pa.string()))


class QualityScorer:
    """Append integer quality components + composite quality_score."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        cols: dict[str, list] = {
            "n_tokens": [],
            "n_stopwords": [],
            "total_token_chars": [],
            "n_lines": [],
            "quality_score": [],
        }
        for t in texts:
            t = t or ""
            c = quality_components(t)
            cols["n_tokens"].append(c["n_tokens"])
            cols["n_stopwords"].append(c["n_stopwords"])
            cols["total_token_chars"].append(c["total_token_chars"])
            cols["n_lines"].append(c["n_lines"])
            cols["quality_score"].append(quality_score(t))
        out = batch
        for name in ("n_tokens", "n_stopwords", "total_token_chars", "n_lines"):
            out = out.append_column(name, pa.array(cols[name], pa.int64()))
        return out.append_column(
            "quality_score", pa.array(cols["quality_score"], pa.float64())
        )


class GopherFilter:
    """Append the Gopher-rule signal columns (core.quality.gopher_rules)
    — all BIGINT so the DuckDB oracle checks the entire rule set
    exactly. Actor-pool stage; per-row Python is inherent (regex scans
    per word/line)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from textalyzer_ray.core.quality import gopher_rules

        rows = [gopher_rules(t or "") for t in batch[self.text_col].to_pylist()]
        out = batch
        if rows:
            keys = list(rows[0].keys())
        else:
            keys = []
        for k in keys:
            out = out.append_column(
                k, pa.array([r[k] for r in rows], pa.int64())
            )
        return out


def add_canonical_url(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append canonical_url (core.urlnorm) — the dedup key for
    crawl-level URL dedup. Task-pool friendly (no state)."""
    from textalyzer_ray.core.urlnorm import canonical_url

    return batch.append_column(
        "canonical_url",
        pa.array(
            [canonical_url(u or "") for u in batch[url_col].to_pylist()],
            pa.string(),
        ),
    )
