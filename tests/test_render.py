"""Output renderer parity, including the reference's golden integration
check: ``textalyzer histogram examples/1984.txt`` prints exactly 239,902
bytes (textalyzer/tests/integration_tests.rs:7-24). We reproduce the
whole path — tokenizer + formatter + trailing newline — against the
same public-domain example document (read-only reference input data)."""

import json

from textalyzer_ray.core.textmetrics import frequency_map
from textalyzer_ray.functions.render import (
    duplication_json,
    format_freq_map,
    format_line_length_histogram,
    freq_json,
    line_length_json,
)

EXAMPLE_1984 = "/root/reference/examples/1984.txt"


class TestGolden1984:
    def test_word_counts_match_survey(self):
        text = open(EXAMPLE_1984, encoding="utf-8").read()
        fm = frequency_map(text)
        assert sum(fm.values()) == 105_421  # BASELINE.md measured words
        assert len(fm) == 8_820  # unique words

    def test_histogram_output_golden_size(self):
        # integration_tests.rs:18-20: stdout is exactly 239,902 bytes;
        # run() appends one newline via writeln! (lib.rs:52)
        text = open(EXAMPLE_1984, encoding="utf-8").read()
        out = format_freq_map(frequency_map(text)) + "\n"
        assert len(out.encode("utf-8")) == 239_902


class TestFormatters:
    def test_freq_map_layout(self):
        out = format_freq_map({"hello": 3, "a": 1})
        lines = out.splitlines()
        assert lines[0].startswith("hello  3  ")
        assert lines[1].startswith("    a  1  ")
        # longest bar fits the 80-col budget: word(5)+2+count(1)+2=10
        assert len(lines[0]) <= 80
        assert lines[0].count("▆") == 70  # remaining space at max count

    def test_line_length_histogram_layout(self):
        # line_length.rs:176-189 structural checks
        out = format_line_length_histogram({5: 2, 10: 1, 15: 3})
        assert "Length  Count  Histogram" in out
        assert "--  -  ---------" in out
        assert " 5  2" in out
        assert "10  1" in out
        assert "15  3" in out
        assert "▆" in out

    def test_line_length_histogram_empty(self):
        assert format_line_length_histogram({}) == "No lines found to analyze."

    def test_freq_json_order_and_shape(self):
        data = json.loads(freq_json({"b": 2, "a": 2, "z": 5}))
        assert data == [
            {"word": "z", "count": 5},
            {"word": "a", "count": 2},
            {"word": "b", "count": 2},
        ]

    def test_line_length_json(self):
        data = json.loads(line_length_json({7: 1, 5: 2}))
        assert data == [{"length": 5, "count": 2}, {"length": 7, "count": 1}]

    def test_duplication_json(self):
        data = json.loads(
            duplication_json([("a\nb", [("f.txt", 1), ("g.txt", 3)])])
        )
        assert data == [
            {
                "content": "a\nb",
                "locations": [
                    {"path": "f.txt", "line": 1},
                    {"path": "g.txt", "line": 3},
                ],
            }
        ]
