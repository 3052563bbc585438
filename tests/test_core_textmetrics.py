"""Ported reference unit fixtures for the text primitives (no Ray).

Sources: textalyzer/src/frequency.rs:11-33 (doctest), :97-115 (unit),
file_utils.rs:191-223, line_length.rs:119-189; FIXTURES.md F3/F4.
"""

from textalyzer_ray.core.textmetrics import (
    display_width,
    frequency_map,
    leading_indent_bytes,
    split_lines,
    tokenize,
    trimmed_byte_len,
)


class TestFrequencyMap:
    def test_doctest_vector(self):
        # frequency.rs:11-33
        assert frequency_map("This test is a test to test the frequency map.") == {
            "this": 1,
            "test": 3,
            "is": 1,
            "a": 1,
            "to": 1,
            "the": 1,
            "frequency": 1,
            "map": 1,
        }

    def test_unit_vector(self):
        # frequency.rs:97-115
        assert frequency_map("Hello World! A warm welcome to the world.") == {
            "a": 1,
            "hello": 1,
            "the": 1,
            "to": 1,
            "warm": 1,
            "welcome": 1,
            "world": 2,
        }

    def test_digits_and_underscore_split_tokens(self):
        # frequency.rs:36 splits on every non-alphabetic char
        assert tokenize("foo_bar baz123qux") == ["foo", "bar", "baz", "qux"]

    def test_unicode_accents_kept_and_lowercased(self):
        assert frequency_map("Mädel Mädel mädel") == {"mädel": 3}

    def test_cjk_run_is_one_token(self):
        assert tokenize("你好 世界") == ["你好", "世界"]

    def test_emoji_splits(self):
        assert tokenize("hi🚀there") == ["hi", "there"]

    def test_empty(self):
        assert frequency_map("") == {}
        assert frequency_map("123 456 !!!") == {}


class TestSplitLines:
    def test_basic_trailing_newline(self):
        # Rust lines(): no trailing empty element
        assert split_lines("Line one\nLine Two\n") == ["Line one", "Line Two"]

    def test_no_trailing_newline(self):
        assert split_lines("a\nb") == ["a", "b"]

    def test_empty_text(self):
        assert split_lines("") == []

    def test_interior_empty_lines_kept(self):
        assert split_lines("a\n\nb\n") == ["a", "", "b"]

    def test_crlf_stripped(self):
        assert split_lines("a\r\nb\r\n") == ["a", "b"]

    def test_bare_trailing_cr_kept(self):
        # Rust lines("a\r") == ["a\r"]
        assert split_lines("a\r") == ["a\r"]

    def test_cr_before_trailing_newline(self):
        assert split_lines("a\r\n\r\n") == ["a", ""]

    def test_only_newline(self):
        assert split_lines("\n") == [""]


class TestDisplayWidth:
    def test_ascii(self):
        assert display_width("line1") == 5
        assert display_width("") == 0

    def test_cjk_double_width(self):
        # line_length.rs:154-166: "你好" -> 4, "🚀" -> 2
        assert display_width("你好") == 4
        assert display_width("🚀") == 2

    def test_control_chars_zero_width(self):
        assert display_width("a\tb") == 2


class TestByteLengths:
    def test_trimmed_byte_len(self):
        # duplication.rs:14: bytes of trimmed str
        assert trimmed_byte_len("  abc  ") == 3
        assert trimmed_byte_len("你好") == 6  # 2 chars, 6 UTF-8 bytes
        assert trimmed_byte_len("   ") == 0

    def test_leading_indent_bytes(self):
        assert leading_indent_bytes("    x") == 4
        assert leading_indent_bytes("x") == 0
        assert leading_indent_bytes("\t x") == 2


def test_rust_trim_excludes_separator_controls():
    """ADVICE r1 (low): \x1c-\x1f are Python-isspace but NOT Unicode
    White_Space; Rust trim() and polars strip_chars keep them."""
    from textalyzer_ray.core.textmetrics import rust_trim, trimmed_byte_len

    s = "\x1cabc\x1f"
    assert rust_trim(s) == s
    assert trimmed_byte_len(" \x1ca　") == 2  # \x1c + 'a'
    assert rust_trim("  x  ") == "x"
