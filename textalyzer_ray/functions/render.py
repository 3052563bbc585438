"""Reference-exact output renderers (SURVEY.md S4/S5/S7/S8).

These are driver-side pretty-printers / JSON writers over SMALL collected
results (the distributed engine produces the aggregates; rendering is
not a distributed concern). Semantics cloned:

- ``format_freq_map``: textalyzer/src/frequency.rs:48-91 — sort count
  desc (stable), right-pad word and count to max display widths, bar of
  U+2586 scaled so the longest line fits MAX_LINE_LENGTH=80 columns;
  bar width computed in f32 then rounded half-away-from-zero exactly as
  Rust ``f32::round``.
- ``format_line_length_histogram``: line_length.rs:40-91 — header +
  dashes, lengths ascending, bar scaled to 60 (f64, round
  half-away-from-zero).
- ``freq_json`` / ``line_length_json`` / ``duplication_json``: the
  serde_json::to_string_pretty shapes of lib.rs:39-49, line_length.rs:
  101-110, lib.rs:134-147 (2-space indent), with the same stable sorts.
"""

from __future__ import annotations

import json
import math

import numpy as np

from textalyzer_ray.core.textmetrics import display_width

MAX_LINE_LENGTH = 80  # frequency.rs:5
MAX_LINE_LENGTH_HISTOGRAM_BAR = 60  # line_length.rs:10
BAR = "▆"


def _pad_right_align(s: str, width: int) -> str:
    """pad crate Alignment::Right with display-width padding."""
    return " " * max(width - display_width(s), 0) + s


def _round_half_away(x: float) -> int:
    """Rust f32/f64 ``.round()``: half away from zero (not banker's)."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def format_freq_map(freq_map: dict[str, int]) -> str:
    """frequency.rs:48-91. Tie order among equal counts follows dict
    iteration order (the reference's HashMap order is arbitrary; total
    output SIZE is order-invariant, which is what the golden test pins)."""
    freq_vec = sorted(freq_map.items(), key=lambda kv: -kv[1])
    longest_word = ""
    highest_number = 0
    for word, count in freq_vec:
        if display_width(word) > display_width(longest_word):
            longest_word = word
        if count > highest_number:
            highest_number = count
    max_number_length = len(str(highest_number))
    max_word_length = display_width(longest_word)
    max_line_length = max_word_length + 2 + max_number_length + 2
    remaining_space = MAX_LINE_LENGTH - max_line_length

    out = []
    rem32 = np.float32(remaining_space)
    high32 = np.float32(highest_number)
    for word, count in freq_vec:
        bar_width = _round_half_away(
            float(np.float32(rem32 / high32) * np.float32(count))
        )
        out.append(
            f"{_pad_right_align(word, max_word_length)}  "
            f"{_pad_right_align(str(count), max_number_length)}  "
            f"{BAR * bar_width}\n"
        )
    return "".join(out)


def format_line_length_histogram(histogram: dict[int, int]) -> str:
    """line_length.rs:40-91."""
    if not histogram:
        return "No lines found to analyze."
    lengths = sorted(histogram)
    max_length = lengths[-1]
    max_count = max(histogram.values())
    lw = len(str(max_length))
    cw = len(str(max_count))
    # Rust {:>width$} pads to at least width, never truncates
    out = [f"{'Length':>{lw}}  {'Count':>{cw}}  Histogram\n"]
    out.append(f"{'-' * lw}  {'-' * cw}  {'-' * 9}\n")
    for length in lengths:
        count = histogram[length]
        bar_width = (
            _round_half_away(
                MAX_LINE_LENGTH_HISTOGRAM_BAR * (count / max_count)
            )
            if max_count > 0
            else 0
        )
        out.append(
            f"{_pad_right_align(str(length), lw)}  "
            f"{_pad_right_align(str(count), cw)}  "
            f"{BAR * bar_width}\n"
        )
    return "".join(out)


def _pretty(obj) -> str:
    """serde_json::to_string_pretty format: 2-space indent."""
    return json.dumps(obj, indent=2, ensure_ascii=False)


def freq_json(freq_map: dict[str, int]) -> str:
    """lib.rs:39-49: sort (count desc, word asc)."""
    items = sorted(freq_map.items(), key=lambda kv: (-kv[1], kv[0]))
    return _pretty([{"word": w, "count": c} for w, c in items])


def line_length_json(histogram: dict[int, int]) -> str:
    """line_length.rs:101-110: sort by length."""
    return _pretty(
        [{"length": l, "count": histogram[l]} for l in sorted(histogram)]
    )


def duplication_json(dups: list[tuple[str, list[tuple[str, int]]]]) -> str:
    """lib.rs:134-147: DuplicationItem{content, locations:[{path,line}]}."""
    return _pretty(
        [
            {
                "content": content,
                "locations": [{"path": p, "line": ln} for p, ln in locs],
            }
            for content, locs in dups
        ]
    )
