"""Property-based equivalence: the vectorized batch stages must agree
with the pure-Python oracles on ARBITRARY text (hypothesis), including
nulls and weird unicode — this is what makes 'oracle == pipeline by
construction' an enforced invariant rather than a hope. No Ray needed:
the stage functions are plain Arrow-in/Arrow-out callables."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from textalyzer_ray.core.textmetrics import (
    display_width,
    frequency_map,
    split_lines,
    tokenize,
)
from textalyzer_ray.stages.lines import explode_lines, line_widths
from textalyzer_ray.stages.tokenize import (
    doc_token_counts,
    partial_word_counts,
)

# Text including newlines, CR, CJK, emoji, digits, punctuation — drawn
# from established Unicode ranges where the oracle's `regex` module and
# pyarrow's RE2 agree on \p{L}. Newly-assigned planes diverge between
# the libs' Unicode table versions (e.g. U+13460 Egyptian extensions);
# SURVEY.md §2.8 policy: conformance avoids those, so the property does
# too.
_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789 \t\n\r.,;:!?_-()[]{}'\"<>/\\|@#$%^&*+=~`"
    "äöüßéèêàçñ你好世界漢字καλημέραпривет"
    # Full-vs-simple case-mapping divergence set: U+0130 İ (the only
    # unconditional multi-char lowercase in SpecialCasing.txt), dotless
    # ı, and uppercase Greek incl. Σ (contextual Final_Sigma) — exactly
    # where pc.utf8_lower diverges from str.lower().
    "İıΟΔΥΣΕΑΒΓΩ"
    "🚀😀🎉  "
)
texts = st.text(alphabet=_ALPHABET, max_size=200)


@settings(max_examples=150, deadline=None)
@given(st.lists(texts, min_size=1, max_size=8))
def test_partial_word_counts_matches_oracle(docs):
    t = pa.table({"text": docs})
    out = partial_word_counts(t)
    got = dict(zip(out["word"].to_pylist(), out["count"].to_pylist()))
    expected = {}
    for d in docs:
        for w, c in frequency_map(d).items():
            expected[w] = expected.get(w, 0) + c
    assert got == expected


@settings(max_examples=150, deadline=None)
@given(st.lists(texts, min_size=1, max_size=8))
def test_doc_token_counts_matches_oracle(docs):
    t = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    out = doc_token_counts(t)
    got = dict(zip(out["doc_id"].to_pylist(), out["n_tokens"].to_pylist()))
    assert got == {i: len(tokenize(d)) for i, d in enumerate(docs)}


@settings(max_examples=150, deadline=None)
@given(st.lists(texts, min_size=1, max_size=8))
def test_explode_lines_matches_rust_lines(docs):
    t = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    out = explode_lines(t)
    got: dict[int, list] = {}
    for i, c, n in zip(
        out["doc_id"].to_pylist(),
        out["content"].to_pylist(),
        out["line_number"].to_pylist(),
    ):
        got.setdefault(i, []).append((n, c))
    for i, d in enumerate(docs):
        expected = [(j + 1, l) for j, l in enumerate(split_lines(d))]
        assert got.get(i, []) == expected, (i, repr(d))


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(max_size=80), min_size=1, max_size=10))
def test_line_widths_match_oracle(lines):
    t = pa.table({"content": pa.array(lines, pa.string())})
    out = line_widths(t)
    assert out["width"].to_pylist() == [display_width(l) for l in lines]


def test_null_text_handling():
    """Null text cells must not crash the stages (treated as empty)."""
    t = pa.table({"doc_id": [0, 1, 2], "text": pa.array(["a b", None, "c"], pa.string())})
    pwc = partial_word_counts(t)
    got = dict(zip(pwc["word"].to_pylist(), pwc["count"].to_pylist()))
    assert got == {"a": 1, "b": 1, "c": 1}
    el = explode_lines(t)
    assert el["doc_id"].to_pylist() == [0, 2]
    dtc = doc_token_counts(t)
    assert dict(zip(dtc["doc_id"].to_pylist(), dtc["n_tokens"].to_pylist())) == {
        0: 2,
        1: 0,
        2: 1,
    }


def test_full_casefold_divergence_cases():
    """ADVICE r1 (high): stage must match split-then-str.lower() on the
    full-mapping divergence chars — İ (U+0130 -> i + combining dot) and
    contextual final sigma."""
    docs = ["İstanbul İ", "ΟΔΥΣΣΕΥΣ", "ΣΣ Σ", "İΣ mixed ΒΑΣΙΣ"]
    t = pa.table({"text": docs})
    out = partial_word_counts(t)
    got = dict(zip(out["word"].to_pylist(), out["count"].to_pylist()))
    expected = {}
    for d in docs:
        for w, c in frequency_map(d).items():
            expected[w] = expected.get(w, 0) + c
    assert got == expected
    assert "i̇stanbul" in got  # full mapping, not simple 'istanbul'
    assert "οδυσσευς" in got  # final sigma
