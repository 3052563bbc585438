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


def test_suppress_overlaps_mixed_equivalence():
    """r3 pre-suppression: running truly-clean blocks through the
    mixed suppressor as interacting=False must give the original
    suppress_overlaps result — including the reference's quirk where a
    NON-kept block's claims activate once the emitted count grows (so
    clean emissions must still count)."""
    import itertools

    from textalyzer_ray.core.duplication import (
        suppress_overlaps,
        suppress_overlaps_mixed,
    )

    def spans_overlap(c1, l1, c2, l2):
        n1, n2 = c1.count("\n") + 1, c2.count("\n") + 1
        return l1 <= l2 + n2 - 1 and l2 <= l1 + n1 - 1

    # Deterministic pseudo-random block sets (no RNG: parametric grid).
    cases = []
    for seed in range(12):
        blocks = []
        for b in range(6):
            n_lines = 1 + (seed + b) % 4
            content = "\n".join(f"l{seed}b{b}x{i}" for i in range(n_lines))
            locs = [
                (f"f{(seed + b + k) % 3}", 1 + ((seed * 7 + b * 5 + k * 3) % 15))
                for k in range(2 + (b % 2))
            ]
            blocks.append((content, sorted(set(locs))))
        blocks.sort(key=lambda cl: (-(cl[0].count("\n") + 1), -len(cl[0]), cl[0]))
        cases.append(blocks)
    for blocks in cases:
        # ground-truth interaction: any location sharing a span with a
        # location of ANY candidate (conservative same-block marking
        # mirrors the pipeline's sweep)
        interacting = set()
        for (i, (c1, ls1)), (j, (c2, ls2)) in itertools.combinations(
            enumerate(blocks), 2
        ):
            for f1, l1 in ls1:
                for f2, l2 in ls2:
                    if f1 == f2 and spans_overlap(c1, l1, c2, l2):
                        interacting.add(i)
                        interacting.add(j)
        want = suppress_overlaps(blocks)
        got = suppress_overlaps_mixed(
            (c, ls, i in interacting) for i, (c, ls) in enumerate(blocks)
        )
        assert got == want


def test_suppress_overlaps_mixed_counts_clean_emissions():
    """A clean block emitted between a non-kept claimer and a later
    overlapping block must activate the pending claim (duplication.rs
    315-318 semantics) — the exact case that forbids skipping clean
    blocks from the emission count."""
    from textalyzer_ray.core.duplication import (
        suppress_overlaps,
        suppress_overlaps_mixed,
    )

    # D kept (claims f:1-3); A loses (f,2) to D, left with ONE valid
    # location -> NOT kept, but its claim on f:20-21 is recorded at
    # idx=1; clean C's emission grows the result to 2, ACTIVATING that
    # claim; B's (f,20) must then be blocked. A mixed runner that skips
    # clean blocks from the emitted count would wrongly keep B.
    blocks = [
        ("d1\nd2\nd3", [("f", 1), ("g", 1)]),
        ("a1\na2", [("f", 2), ("f", 20)]),
        ("c1\nc2", [("x", 1), ("y", 1)]),  # clean: paths x/y untouched
        ("b1", [("f", 20), ("f", 30)]),
    ]
    want = suppress_overlaps(blocks)
    assert [c for c, _ in want] == ["d1\nd2\nd3", "c1\nc2"]  # B suppressed
    got = suppress_overlaps_mixed(
        [
            (blocks[0][0], blocks[0][1], True),
            (blocks[1][0], blocks[1][1], True),
            (blocks[2][0], blocks[2][1], False),  # clean
            (blocks[3][0], blocks[3][1], True),
        ]
    )
    assert got == want
    # the discriminating negative: NOT counting the clean emission keeps B
    broken = suppress_overlaps_mixed(
        [
            (blocks[0][0], blocks[0][1], True),
            (blocks[1][0], blocks[1][1], True),
            (blocks[3][0], blocks[3][1], True),
        ]
    )
    assert any(c == "b1" for c, _ in broken)
