"""Pure-Python duplication-detection oracle (reference-exact semantics).

These functions reproduce the reference algorithms at single-process scale
(textalyzer/src/duplication.rs) and serve as the correctness oracle for
the distributed pipelines in ``textalyzer_ray.pipelines.duplication``.

A "document" here is ``(name, text)`` — the reference's FileEntry
(types.rs:44-48) with the url/path as identity.

Exact semantics reproduced:
- single-line (duplication.rs:10-40): explode lines (skip empty-after-trim,
  keep trimmed byte length > 5), group identical trimmed lines, keep groups
  with >= 2 locations, sort by trimmed byte length descending (stable).
- multi-line (duplication.rs:52-339): trimmed-line index -> duplicate set;
  anchors are RAW lines found in the trimmed-key set (the reference's
  raw-vs-trimmed asymmetry at duplication.rs:144-149: an indented copy is
  only found *from* its flush-left twin); pairwise forward extension while
  trimmed lines are equal; block = anchor's raw lines minus common
  min-indent (bytes, duplication.rs:194-218); global sort by (non-empty
  lines desc, byte length desc); sequential greedy overlap suppression
  (duplication.rs:301-336) where positions claimed by the *same* block do
  not conflict; keep blocks with >= 2 surviving locations.
- min-lines retain filter (lib.rs:122-129): >= min_lines non-empty lines.

Determinism note: the reference's location order is insertion order under
rayon parallelism (nondeterministic); this oracle is sequential, so its
order is input order. Tests compare location sets / sorted forms.
"""

from __future__ import annotations

from textalyzer_ray.core.textmetrics import (
    leading_indent_bytes,
    rust_trim,
    split_lines,
    trimmed_byte_len,
)

Doc = tuple[str, str]
Location = tuple[str, int]
DupResult = list[tuple[str, list[Location]]]


def find_duplicate_lines(docs: list[Doc]) -> DupResult:
    """Single-line exact duplication (duplication.rs:10-40)."""
    line_map: dict[str, list[Location]] = {}
    for name, text in docs:
        for i, line in enumerate(split_lines(text)):
            trimmed = rust_trim(line)
            if not trimmed or trimmed_byte_len(line) <= 5:
                continue
            line_map.setdefault(trimmed, []).append((name, i + 1))
    dups = [(line, locs) for line, locs in line_map.items() if len(locs) > 1]
    # stable sort: trimmed byte length descending (duplication.rs:33-37)
    dups.sort(key=lambda d: -trimmed_byte_len(d[0]))
    return dups


def _strip_indent_bytes(line: str, n_bytes: int) -> str:
    """Byte-slice ``line[n_bytes..]`` (duplication.rs:208-218 slices Rust
    bytes); falls back to the whole line if the slice is invalid UTF-8 or
    the line is shorter than the indent (reference keeps `l.clone()`)."""
    enc = line.encode("utf-8")
    if len(enc) < n_bytes:
        return line
    try:
        return enc[n_bytes:].decode("utf-8")
    except UnicodeDecodeError:
        return line


def nonempty_line_count(content: str) -> int:
    return sum(1 for line in content.split("\n") if rust_trim(line))


def form_block(block_lines: list[str]) -> str:
    """Indent-normalize a matched slice of raw lines
    (duplication.rs:190-218): strip the common minimum leading-whitespace
    byte count across non-blank lines, join with newline."""
    indents = [leading_indent_bytes(l) for l in block_lines if rust_trim(l)]
    min_indent = min(indents) if indents else 0
    return "\n".join(_strip_indent_bytes(l, min_indent) for l in block_lines)


def suppress_overlaps(
    sorted_blocks: list[tuple[str, list[Location]]],
) -> DupResult:
    """Sequential greedy overlap suppression over blocks sorted longest-
    first (duplication.rs:301-336). A location survives iff no line of its
    span was claimed by an *earlier-emitted* block; spans claimed by other
    locations of the same block do not conflict (`idx < result.len()`
    check at duplication.rs:315-318). Blocks keep >= 2 survivors."""
    return suppress_overlaps_mixed(
        (content, locations, True) for content, locations in sorted_blocks
    )


def suppress_overlaps_mixed(
    sorted_entries,
) -> DupResult:
    """``suppress_overlaps`` over a mixed stream of
    ``(content, locations, interacting)`` entries in global sorted order.

    ``interacting=False`` marks a block PROVEN (by the distributed
    per-path overlap sweep) to share no line span with any other
    candidate location on any of its paths: such a block is emitted
    as-is — every location is trivially valid, nothing can claim its
    spans and its claims can block nobody. It still increments the
    emitted count, which matters: claims recorded by an earlier
    NON-kept block activate as soon as ``len(result)`` grows past their
    recording index (the reference's duplication.rs:315-318 semantics),
    so skipping clean emissions would change later decisions. With every
    entry marked interacting this is exactly ``suppress_overlaps``."""
    result: DupResult = []
    used: dict[Location, int] = {}
    for content, locations, interacting in sorted_entries:
        if not interacting:
            result.append((content, list(locations)))
            continue
        lines_count = content.count("\n") + 1
        valid: list[Location] = []
        for fname, line_num in locations:
            end = line_num + lines_count - 1
            free = True
            for l in range(line_num, end + 1):
                idx = used.get((fname, l))
                if idx is not None and idx < len(result):
                    free = False
                    break
            if free:
                valid.append((fname, line_num))
                for l in range(line_num, end + 1):
                    used[(fname, l)] = len(result)
        if len(valid) >= 2:
            result.append((content, valid))
    return result


def find_multi_line_duplications(docs: list[Doc]) -> DupResult:
    """Multi-line near-block duplication (duplication.rs:52-339)."""
    file_lines: dict[str, list[str]] = {
        name: split_lines(text) for name, text in docs
    }

    # Phase 1-2: trimmed-line index (duplication.rs:85-109)
    line_index: dict[str, list[Location]] = {}
    for name, _ in docs:
        for i, line in enumerate(file_lines[name]):
            trimmed = rust_trim(line)
            if trimmed:
                line_index.setdefault(trimmed, []).append((name, i + 1))

    # Phase 3: retain duplicates only (duplication.rs:118-121)
    duplicate_lines = {k: v for k, v in line_index.items() if len(v) > 1}
    dup_set = set(duplicate_lines)

    # Phase 4: pairwise block formation (duplication.rs:131-254)
    blocks: dict[str, list[Location]] = {}
    for name, _ in docs:
        lines = file_lines[name]
        for start in range(len(lines)):
            first = lines[start]
            # RAW-line membership in the trimmed-key set: the asymmetry.
            if first not in dup_set or not rust_trim(first):
                continue
            for other_name, other_line in duplicate_lines[first]:
                if other_name == name and other_line == start + 1:
                    continue
                other_lines = file_lines[other_name]
                other_start = other_line - 1
                max_len = min(len(lines) - start, len(other_lines) - other_start)
                match_len = 0
                for off in range(max_len):
                    if (
                        rust_trim(lines[start + off])
                        == rust_trim(other_lines[other_start + off])
                    ):
                        match_len += 1
                    else:
                        break
                if match_len >= 1:
                    block = form_block(lines[start : start + match_len])
                    locs = blocks.setdefault(block, [])
                    cur = (name, start + 1)
                    if cur not in locs:
                        locs.append(cur)
                    oth = (other_name, other_line)
                    if oth not in locs:
                        locs.append(oth)

    # Phase 5: filter + sort (duplication.rs:263-296); Python sort is
    # stable like Rust's sort_by, tie order = insertion order.
    all_blocks = [
        (c, locs) for c, locs in blocks.items() if nonempty_line_count(c) >= 1
    ]
    all_blocks.sort(
        key=lambda cl: (-nonempty_line_count(cl[0]), -len(cl[0].encode("utf-8")))
    )

    # Phase 6: greedy overlap suppression (duplication.rs:301-336)
    return suppress_overlaps(all_blocks)


def apply_min_lines(dups: DupResult, min_lines: int) -> DupResult:
    """lib.rs:122-129: keep blocks with >= min_lines non-empty lines."""
    return [d for d in dups if nonempty_line_count(d[0]) >= min_lines]


def duplication_pipeline(docs: list[Doc], min_lines: int = 3) -> DupResult:
    """End-to-end reference behavior (lib.rs:115-132): min_lines <= 1 ->
    single-line path; else multi-line path + retain filter."""
    if min_lines <= 1:
        return find_duplicate_lines(docs)
    return apply_min_lines(find_multi_line_duplications(docs), min_lines)
