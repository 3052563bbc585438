"""Exact single-document text primitives.

Each function pins the behavior of a reference primitive
(ad-si/Textalyzer, citations into /root/reference):

- ``tokenize`` / ``frequency_map``: textalyzer/src/frequency.rs:34-45 —
  split on every char that is not Unicode-alphabetic, drop empty tokens,
  Unicode-lowercase. We use the ``\\p{L}`` (Letter) class, which equals
  RE2's ``\\pL`` used by the Arrow kernel in the distributed stage, so
  oracle == pipeline by construction. (Rust ``char::is_alphabetic`` is the
  slightly wider Unicode *Alphabetic* property — also Nl + Other_Alphabetic;
  the divergence is only on rare chars like Roman-numeral codepoints, and
  conformance fixtures avoid them.)
- ``split_lines``: Rust ``str::lines`` (textalyzer/src/file_utils.rs:25,
  duplication.rs:71) — split on ``\\n``, strip one ``\\r`` immediately
  before each ``\\n``, no trailing empty line. NOT Python ``splitlines()``
  (which splits on many more separators).
- ``display_width``: ``UnicodeWidthStr::width`` (line_length.rs:31,
  frequency.rs:55) — wcwidth display columns, control chars count 0.
- ``trimmed_byte_len``: byte length of the trimmed string
  (duplication.rs:14,34-36) — bytes, not chars.
"""

from __future__ import annotations

import regex as _regex
from wcwidth import wcwidth as _wcwidth

# One compiled splitter, shared by the oracle and any per-row fallback
# code. `[^\p{L}]+` == RE2 `[^\pL]+` used by pyarrow.compute in the
# distributed tokenizer stage.
TOKEN_SPLIT_PATTERN = r"[^\p{L}]+"
_TOKEN_SPLIT = _regex.compile(TOKEN_SPLIT_PATTERN)


def tokenize(text: str) -> list[str]:
    """Reference tokenization (frequency.rs:34-45): split on runs of
    non-letter chars, drop empties, lowercase (full Unicode)."""
    return [w.lower() for w in _TOKEN_SPLIT.split(text) if w]


def frequency_map(text: str) -> dict[str, int]:
    """word -> count over one document (frequency.rs:34-45)."""
    freq: dict[str, int] = {}
    for word in tokenize(text):
        freq[word] = freq.get(word, 0) + 1
    return freq


def split_lines(text: str) -> list[str]:
    """Rust ``str::lines`` semantics.

    - ``""`` -> ``[]``
    - a trailing ``\\n`` does not produce a trailing empty line
    - one ``\\r`` immediately before a ``\\n`` is stripped; a bare final
      ``\\r`` (no newline after it) is kept.
    """
    if not text:
        return []
    ended_nl = text.endswith("\n")
    parts = (text[:-1] if ended_nl else text).split("\n")
    last = len(parts) - 1
    return [
        p[:-1] if p.endswith("\r") and (i < last or ended_nl) else p
        for i, p in enumerate(parts)
    ]


def display_width(line: str) -> int:
    """Terminal display columns (unicode-width crate semantics): sum of
    per-char wcwidth, where non-printable/control chars count as 0
    (wcwidth() returns -1 for those; the Rust crate returns None -> 0)."""
    if line.isascii() and line.isprintable():
        return len(line)
    return sum(max(_wcwidth(ch), 0) for ch in line)


# Rust char::is_whitespace == the Unicode White_Space property exactly.
# Python str.strip()/isspace() ADDITIONALLY strips \x1c-\x1f (file/group/
# record/unit separators), so the oracle must strip an explicit charset
# to stay bit-equal with Rust trim() and polars strip_chars (ADVICE r1).
RUST_WHITESPACE = (
    "\t\n\x0b\x0c\r \x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
)


def rust_trim(s: str) -> str:
    """Rust ``str::trim()`` — strip White_Space, not Python isspace."""
    return s.strip(RUST_WHITESPACE)


def rust_trim_start(s: str) -> str:
    """Rust ``str::trim_start()``."""
    return s.lstrip(RUST_WHITESPACE)


def trimmed_byte_len(s: str) -> int:
    """Byte length of the Unicode-whitespace-trimmed string
    (duplication.rs:14: ``line.trim().len()`` — Rust len() is bytes)."""
    return len(rust_trim(s).encode("utf-8"))


def leading_indent_bytes(line: str) -> int:
    """Leading-whitespace byte count (duplication.rs:197-204:
    ``l.len() - l.trim_start().len()`` in bytes)."""
    return len(line.encode("utf-8")) - len(rust_trim_start(line).encode("utf-8"))
