"""Minimal gitignore matcher vs a fixture repo — mirrors the reference's
ignore-crate walk (file_utils.rs:60-78)."""

import os

from textalyzer_ray.cli import find_all_files
from textalyzer_ray.core.ignore import IgnoreRule


def mk(tmp_path, rel, content=""):
    p = tmp_path / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(content)


def names(tmp_path, files):
    return sorted(os.path.relpath(f, tmp_path) for f in files)


class TestIgnoreRule:
    def test_basename_any_depth(self):
        r = IgnoreRule("*.log")
        assert r.match("a.log", False) and r.match("x/y/b.log", False)
        assert not r.match("a.logx", False)

    def test_anchored_with_slash(self):
        r = IgnoreRule("build/out")
        assert r.match("build/out", False)
        assert not r.match("x/build/out", False)

    def test_dir_only(self):
        r = IgnoreRule("target/")
        assert r.match("target", True)
        assert not r.match("target", False)

    def test_doublestar(self):
        r = IgnoreRule("a/**/b")
        assert r.match("a/b", False) and r.match("a/x/y/b", False)
        assert not r.match("a/b/c", False)

    def test_negation_and_class(self):
        assert IgnoreRule("!keep.log").negation
        r = IgnoreRule("file[0-2].txt")
        assert r.match("file1.txt", False) and not r.match("file3.txt", False)


class TestWalk:
    def test_fixture_repo(self, tmp_path):
        mk(tmp_path, ".gitignore", "target/\n*.log\n!keep.log\n/secret.txt\n")
        mk(tmp_path, "src/main.rs")
        mk(tmp_path, "src/debug.log")       # ignored by *.log
        mk(tmp_path, "keep.log")            # negated back in
        mk(tmp_path, "secret.txt")          # anchored
        mk(tmp_path, "sub/secret.txt")      # NOT anchored here -> kept
        mk(tmp_path, "target/out.bin")      # pruned dir
        mk(tmp_path, "node_modules/x.js")   # no rule -> kept
        mk(tmp_path, ".git/config")         # always skipped
        got = names(tmp_path, find_all_files(str(tmp_path)))
        assert got == [
            "keep.log",
            "node_modules/x.js",
            "src/main.rs",
            "sub/secret.txt",
        ]

    def test_nested_gitignore_overrides(self, tmp_path):
        mk(tmp_path, ".gitignore", "*.tmp\n")
        mk(tmp_path, "sub/.gitignore", "!special.tmp\ndata/\n")
        mk(tmp_path, "a.tmp")
        mk(tmp_path, "sub/special.tmp")     # re-included by nested file
        mk(tmp_path, "sub/other.tmp")       # still ignored
        mk(tmp_path, "sub/data/big.csv")    # pruned by nested rule
        mk(tmp_path, "sub/code.py")
        got = names(tmp_path, find_all_files(str(tmp_path)))
        assert got == ["sub/code.py", "sub/special.tmp"]

    def test_git_info_exclude(self, tmp_path):
        mk(tmp_path, ".git/info/exclude", "private/\n")
        mk(tmp_path, "private/x.txt")
        mk(tmp_path, "public.txt")
        got = names(tmp_path, find_all_files(str(tmp_path)))
        assert got == ["public.txt"]

    def test_respect_ignores_off(self, tmp_path):
        mk(tmp_path, ".gitignore", "*.log\n")
        mk(tmp_path, "a.log")
        got = names(tmp_path, find_all_files(str(tmp_path), respect_ignores=False))
        assert got == ["a.log"]
