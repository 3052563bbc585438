"""CLI surface parity (reference subcommands over the engine)."""

import json
import subprocess
import sys


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "textalyzer_ray", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )


class TestHistogramCommand:
    def test_json(self, tmp_path):
        f = tmp_path / "t.txt"
        f.write_text("Hello World! A warm welcome to the world.")
        r = run_cli("histogram", str(f), "--json")
        assert r.returncode == 0
        data = json.loads(r.stdout)
        assert data[0] == {"word": "world", "count": 2}
        assert {d["word"]: d["count"] for d in data} == {
            "a": 1, "hello": 1, "the": 1, "to": 1,
            "warm": 1, "welcome": 1, "world": 2,
        }

    def test_text_output(self, tmp_path):
        f = tmp_path / "t.txt"
        f.write_text("alpha alpha beta")
        r = run_cli("histogram", str(f))
        assert r.returncode == 0
        lines = r.stdout.splitlines()
        assert lines[0].startswith("alpha  2  ")
        assert "▆" in lines[0]

    def test_missing_file(self):
        r = run_cli("histogram", "/nonexistent/file.txt")
        assert r.returncode == 1
        assert "Error" in r.stderr


class TestDuplicationCommand:
    def test_single_line_json(self, tmp_path):
        (tmp_path / "a.txt").write_text(
            "This is a test.\nThis is only a test.\nThis is a test.\n"
        )
        (tmp_path / "b.txt").write_text("This is a test.\n")
        r = run_cli(
            "duplication", "--min-lines", "1", "--json", str(tmp_path)
        )
        assert r.returncode == 0
        data = json.loads(r.stdout)
        assert len(data) == 1
        assert data[0]["content"] == "This is a test."
        assert len(data[0]["locations"]) == 3

    def test_multi_line_default(self, tmp_path):
        block = "line one shared\nline two shared\nline three shared\n"
        (tmp_path / "a.txt").write_text(block + "unique a\n")
        (tmp_path / "b.txt").write_text("other\n" + block)
        r = run_cli("duplication", "--json", str(tmp_path))
        assert r.returncode == 0
        data = json.loads(r.stdout)
        assert len(data) == 1
        assert data[0]["content"] == block.strip("\n")

    def test_git_dir_skipped_and_binary_dropped(self, tmp_path):
        (tmp_path / ".git").mkdir()
        (tmp_path / ".git" / "x.txt").write_text("dup line here\ndup line here\n")
        (tmp_path / "bin.dat").write_bytes(b"dup\x00bytes")
        (tmp_path / "ok.txt").write_text("no duplicates at all\n")
        r = run_cli("duplication", "--min-lines", "1", "--json", str(tmp_path))
        assert r.returncode == 0
        assert json.loads(r.stdout) == []

    def test_no_files(self, tmp_path):
        r = run_cli("duplication", str(tmp_path / "missing"))
        assert r.returncode == 1


class TestLineLengthCommand:
    def test_json(self, tmp_path):
        (tmp_path / "a.txt").write_text("line1\nline22\n")
        (tmp_path / "b.txt").write_text("line1\nline333\n")
        r = run_cli("line-length", "--json", str(tmp_path))
        assert r.returncode == 0
        data = json.loads(r.stdout)
        assert data == [
            {"length": 5, "count": 2},
            {"length": 6, "count": 1},
            {"length": 7, "count": 1},
        ]

    def test_text(self, tmp_path):
        (tmp_path / "a.txt").write_text("ab\nab\n")
        r = run_cli("line-length", str(tmp_path))
        assert "Length  Count  Histogram" in r.stdout or "Length" in r.stdout
