"""Distributed duplication pipelines vs the pure-Python oracle
(reference fixtures F2a-F2e)."""

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.core import duplication as oracle
from textalyzer_ray.pipelines.duplication import (
    find_duplicate_lines,
    multi_line_duplications,
)
from tests.test_core_duplication import make_planted_corpus

pytestmark = pytest.mark.usefixtures("quiet_data_context")


def to_ds(docs):
    return rd.from_arrow(
        pa.table(
            {"url": [n for n, _ in docs], "text": [t for _, t in docs]}
        )
    )


def normalize(dups):
    """Order-insensitive form: {content: sorted locations}."""
    return {c: sorted(map(tuple, locs)) for c, locs in dups}


class TestSingleLine:
    def test_f2a_exact(self):
        docs = [
            (
                "file1.txt",
                "This is a test.\nThis is only a test.\nThis is a test.\n"
                "# Ignore empty lines\n\n\n# Ignore short lines\nabc\nabc\n",
            ),
            ("file2.txt", "This is a test.\n"),
        ]
        rows = find_duplicate_lines(to_ds(docs)).take_all()
        assert len(rows) == 1
        r = rows[0]
        assert r["content"] == "This is a test."
        assert [(l["path"], l["line"]) for l in r["locations"]] == [
            ("file1.txt", 1),
            ("file1.txt", 3),
            ("file2.txt", 1),
        ]
        assert r["n_locations"] == 3

    def test_matches_oracle_on_corpus(self):
        docs = make_planted_corpus(4, 120, 2, 3)
        rows = find_duplicate_lines(to_ds(docs)).take_all()
        got = {
            r["content"]: sorted((l["path"], l["line"]) for l in r["locations"])
            for r in rows
        }
        expected = {
            c: sorted(locs) for c, locs in oracle.find_duplicate_lines(docs)
        }
        assert got == expected
        # O3 ordering: trimmed byte length descending
        lens = [r["trimmed_len"] for r in rows]
        assert lens == sorted(lens, reverse=True)


class TestMultiLine:
    def run_both(self, docs, min_lines=1):
        got = multi_line_duplications(
            to_ds(docs), min_lines=min_lines
        )
        exp = oracle.apply_min_lines(
            oracle.find_multi_line_duplications(docs), min_lines
        )
        return normalize(got), normalize(exp)

    def test_f2b_overlap(self):
        docs = [
            (
                "file1.txt",
                "This is a test.\nThis is a second line.\nThis is a third line.\n"
                "Some other content.\nAnd another line here.\n"
                "This is a test.\nThis is a second line.\nA different third line.\n",
            ),
            (
                "file2.txt",
                "Something unrelated.\nThis is a test.\nThis is a second line.\n"
                "This is a third line.\nFinal line.\n",
            ),
        ]
        got, exp = self.run_both(docs)
        assert got == exp
        three = "This is a test.\nThis is a second line.\nThis is a third line."
        assert three in got
        assert got[three] == [("file1.txt", 1), ("file2.txt", 2)]

    def test_f2c_non_overlapping(self):
        docs = [
            (
                "file1.txt",
                "Block A line 1.\nBlock A line 2.\nBlock A line 3.\n"
                "Some middle content.\nBlock B line 1.\nBlock B line 2.\n",
            ),
            (
                "file2.txt",
                "Different stuff.\nBlock A line 1.\nBlock A line 2.\n"
                "Block A line 3.\nSome other content.\n"
                "Block B line 1.\nBlock B line 2.\n",
            ),
        ]
        got, exp = self.run_both(docs)
        assert got == exp
        assert len(got) == 2

    def test_f2d_indentation(self):
        docs = [
            ("file1.txt", '    fn main() {\n        println!("Hello");\n    }\n'),
            ("file2.txt", 'fn main() {\nprintln!("Hello");\n}\n'),
        ]
        got, exp = self.run_both(docs)
        assert got == exp
        assert list(got) == ['fn main() {\nprintln!("Hello");\n}']

    def test_f2e_planted_benchmark(self):
        # full reference benchmark corpus: 20 files x 2000 lines,
        # exactly 30 planted 5-line blocks (duplication.rs:503-555)
        docs = make_planted_corpus(20, 2000, 30, 5)
        got = multi_line_duplications(to_ds(docs), min_lines=3)
        assert len(got) == 30

    def test_min_lines_filter(self):
        docs = [
            ("a.txt", "one shared line\ntwo shared line\nunique a\n"),
            ("b.txt", "one shared line\ntwo shared line\nunique b\n"),
        ]
        got2 = multi_line_duplications(to_ds(docs), min_lines=2)
        got3 = multi_line_duplications(to_ds(docs), min_lines=3)
        assert len(got2) == 1
        assert got3 == []

    def test_empty_corpus(self):
        docs = [("a.txt", "all unique here\n"), ("b.txt", "nothing shared\n")]
        assert multi_line_duplications(to_ds(docs)) == []

    def test_extend_group_member_cap(self):
        """r3 cap (VERDICT #7): a hot anchor line cannot explode the
        O(m²) extension — truncation is deterministic ((path, line)
        order), and an uncapped run on the same corpus is unchanged."""
        import pyarrow as pa

        from textalyzer_ray.pipelines.duplication import _extend_group

        m = 12
        g = pa.table(
            {
                "anchor_key": pa.array([1] * m, pa.uint64()),
                "path": pa.array([f"f{i:02d}" for i in range(m)]),
                "line": pa.array([1] * m, pa.uint32()),
                "suffix": pa.array([["shared line", "tail"]] * m),
                "is_anchor": pa.array([True] * m),
            }
        )
        full = _extend_group(g)
        capped = _extend_group(g, max_group=4)
        # capped keeps the first 4 members by (path, line): f00..f03
        cap_paths = set(capped["path"].to_pylist())
        assert cap_paths == {"f00", "f01", "f02", "f03"}
        assert capped.num_rows == 4 * 3 * 2  # 4 anchors x 3 partners x 2 rows
        assert full.num_rows == m * (m - 1) * 2
        # planted corpus unchanged under a cap comfortably above its
        # group sizes (each planted line appears twice)
        docs = make_planted_corpus(4, 120, 2, 3)
        assert len(
            multi_line_duplications(to_ds(docs), min_lines=3, max_group=8)
        ) == len(multi_line_duplications(to_ds(docs), min_lines=3))
