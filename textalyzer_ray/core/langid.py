"""Language identification: deterministic stopword/script n-gram heuristic.

Training-data-pipeline extension (no reference counterpart; the reference
ships an unused English letter-frequency table,
languages/english/relative-character-frequency.tsv, as the seed of this
idea). No models, no network: a small built-in profile per language =
(stopword set, characteristic-char set, script check). Scoring is a pure
function of the text so the distributed stage equals this oracle.
"""

from __future__ import annotations

from textalyzer_ray.core.textmetrics import tokenize

# Minimal high-frequency function-word profiles (public knowledge).
PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in a is that it for on with as are was be this have "
        "from or by not at but we you they his her its".split()
    ),
    "de": frozenset(
        "der die das und ist nicht ein eine zu mit von den dem des im für "
        "auf als auch es sich an war sind wird bei aus nach".split()
    ),
    "es": frozenset(
        "el la los las de que y en un una es no por con para su al lo como "
        "más pero sus le ya o fue este ha sí".split()
    ),
    "fr": frozenset(
        "le la les de des et un une est que dans pour qui sur pas au du il "
        "elle ne se ce son plus par avec tout être".split()
    ),
}

_CHAR_HINTS: dict[str, frozenset[str]] = {
    "de": frozenset("äöüß"),
    "es": frozenset("ñ¿¡áéíóú"),
    "fr": frozenset("àâçèêëîïôùûœ"),
}


def _cjk_ratio(text: str) -> float:
    if not text:
        return 0.0
    cjk = sum(
        1
        for ch in text
        if "一" <= ch <= "鿿" or "㐀" <= ch <= "䶿"
    )
    return cjk / len(text)


def detect_language(text: str) -> str:
    """Return a language code from {en,de,es,fr,zh,unknown}.

    Deterministic scoring: CJK-script ratio shortcut for zh; otherwise
    stopword-hit ratio per profile plus a small characteristic-character
    bonus; ties break on a fixed language order.
    """
    if not text.strip():
        return "unknown"
    if _cjk_ratio(text) > 0.2:
        return "zh"
    words = tokenize(text)
    if not words:
        return "unknown"
    lower = text.lower()
    best_lang, best_score = "unknown", 0.0
    for lang in ("en", "de", "es", "fr"):  # fixed order = deterministic ties
        hits = sum(1 for w in words if w in PROFILES[lang])
        score = hits / len(words)
        hints = _CHAR_HINTS.get(lang)
        if hints and any(ch in hints for ch in lower):
            score += 0.05
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang if best_score >= 0.05 else "unknown"
