"""Ported reference duplication fixtures (no Ray) — FIXTURES.md F2a-F2e,
sources: textalyzer/src/duplication.rs:350-583 and lib.rs:115-132."""

from textalyzer_ray.core.duplication import (
    apply_min_lines,
    duplication_pipeline,
    find_duplicate_lines,
    find_multi_line_duplications,
)

FILE1_SINGLE = (
    "file1.txt",
    "This is a test.\n"
    "This is only a test.\n"
    "This is a test.\n"
    "# Ignore empty lines\n"
    "\n"
    "\n"
    "# Ignore short lines\n"
    "abc\n"
    "abc\n",
)
FILE2_SINGLE = ("file2.txt", "This is a test.\n")


def test_find_duplicate_lines_f2a():
    # duplication.rs:350-383 — exactly one group with 3 locations
    dups = find_duplicate_lines([FILE1_SINGLE, FILE2_SINGLE])
    assert dups == [
        (
            "This is a test.",
            [("file1.txt", 1), ("file1.txt", 3), ("file2.txt", 1)],
        )
    ]


def test_multi_line_with_overlap_f2b():
    # duplication.rs:386-439 — only the 3-line block survives
    file1 = (
        "file1.txt",
        "This is a test.\n"
        "This is a second line.\n"
        "This is a third line.\n"
        "Some other content.\n"
        "And another line here.\n"
        "This is a test.\n"
        "This is a second line.\n"
        "A different third line.\n",
    )
    file2 = (
        "file2.txt",
        "Something unrelated.\n"
        "This is a test.\n"
        "This is a second line.\n"
        "This is a third line.\n"
        "Final line.\n",
    )
    dups = find_multi_line_duplications([file1, file2])
    assert len(dups) == 1
    block, locations = dups[0]
    assert block == "This is a test.\nThis is a second line.\nThis is a third line."
    assert len(locations) == 2
    assert ("file1.txt", 1) in locations
    assert ("file2.txt", 2) in locations


def test_multi_line_non_overlapping_f2c():
    # duplication.rs:441-499 — both blocks survive, A (3 lines) first
    file1 = (
        "file1.txt",
        "Block A line 1.\nBlock A line 2.\nBlock A line 3.\n"
        "Some middle content.\n"
        "Block B line 1.\nBlock B line 2.\n",
    )
    file2 = (
        "file2.txt",
        "Different stuff.\n"
        "Block A line 1.\nBlock A line 2.\nBlock A line 3.\n"
        "Some other content.\n"
        "Block B line 1.\nBlock B line 2.\n",
    )
    dups = find_multi_line_duplications([file1, file2])
    assert len(dups) == 2
    blocks = {b: locs for b, locs in dups}
    a = "Block A line 1.\nBlock A line 2.\nBlock A line 3."
    b = "Block B line 1.\nBlock B line 2."
    assert set(blocks[a]) == {("file1.txt", 1), ("file2.txt", 2)}
    assert set(blocks[b]) == {("file1.txt", 5), ("file2.txt", 6)}
    assert dups[0][0] == a  # sorted most-lines-first


def test_indentation_insensitive_f2d():
    # duplication.rs:557-583 — common min-indent stripped
    file1 = ("file1.txt", '    fn main() {\n        println!("Hello");\n    }\n')
    file2 = ("file2.txt", 'fn main() {\nprintln!("Hello");\n}\n')
    dups = find_multi_line_duplications([file1, file2])
    assert len(dups) == 1
    block, locs = dups[0]
    assert block == 'fn main() {\nprintln!("Hello");\n}'
    assert len(locs) == 2


def make_planted_corpus(
    num_files: int = 20,
    lines_per_file: int = 2000,
    duplicated_blocks: int = 30,
    block_size: int = 5,
) -> list[tuple[str, str]]:
    """F2e / duplication.rs:503-555 planted benchmark corpus."""
    docs = []
    for i in range(num_files):
        parts = []
        for j in range(lines_per_file):
            if j % 50 == 0 and j < duplicated_blocks * 50:
                block_id = j // 50
                for k in range(block_size):
                    parts.append(f"This is duplicated block {block_id} line {k}")
            else:
                parts.append(f"Unique line {j} in file {i}")
        docs.append((f"file{i}.txt", "\n".join(parts) + "\n"))
    return docs


def test_planted_corpus_f2e_small():
    # scaled-down planted corpus (5 files x 400 lines, 6 blocks) for speed;
    # the full 20x2000/30-block version runs against the Ray pipeline.
    docs = make_planted_corpus(5, 400, 6, 5)
    dups = find_multi_line_duplications(docs)
    assert len(dups) == 6


def test_min_lines_filter():
    # lib.rs:122-129 — retain blocks with >= min_lines non-empty lines
    dups = [("a\nb\nc", [("f", 1), ("g", 1)]), ("a\nb", [("f", 9), ("g", 9)])]
    assert apply_min_lines(dups, 3) == [dups[0]]
    assert duplication_pipeline([FILE1_SINGLE, FILE2_SINGLE], min_lines=1) == \
        find_duplicate_lines([FILE1_SINGLE, FILE2_SINGLE])
