"""Minimal .gitignore-style matcher for file discovery.

The reference walks with the ``ignore`` crate's WalkBuilder
(/root/reference/textalyzer/src/file_utils.rs:60-78): .gitignore,
.ignore, and .git/info/exclude are honored, hidden entries skipped.
``pathspec`` is not available in this environment, so this implements
the common subset of the gitignore pattern language
(https://git-scm.com/docs/gitignore):

- blank lines and ``#`` comments; trailing unescaped spaces stripped
- ``!`` negation (last matching rule wins; deeper files override)
- trailing ``/`` restricts to directories
- a ``/`` anywhere except the end anchors the pattern to the ignore
  file's directory; otherwise it matches at any depth below it
- ``*`` (not crossing ``/``), ``?``, ``[...]`` classes, and ``**``

Not implemented (rare): ``\\``-escapes beyond trailing-space protection,
core.excludesFile from git config.
"""

from __future__ import annotations

import os
import re


def _translate(pat: str) -> str:
    """gitignore glob -> regex source matching a /-separated rel path."""
    # normalize **-forms first
    out = []
    i = 0
    n = len(pat)
    while i < n:
        c = pat[i]
        if c == "*":
            if pat[i : i + 2] == "**":
                if pat[i : i + 3] == "**/":
                    out.append("(?:[^/]+/)*")
                    i += 3
                    continue
                out.append(".*")
                i += 2
                continue
            out.append("[^/]*")
            i += 1
        elif c == "?":
            out.append("[^/]")
            i += 1
        elif c == "[":
            j = i + 1
            if j < n and pat[j] in "!^":
                j += 1
            if j < n and pat[j] == "]":
                j += 1
            while j < n and pat[j] != "]":
                j += 1
            if j < n:
                cls = pat[i + 1 : j]
                if cls.startswith("!"):
                    cls = "^" + cls[1:]
                out.append("[" + cls.replace("\\", "\\\\") + "]")
                i = j + 1
            else:
                out.append(re.escape(c))
                i += 1
        else:
            out.append(re.escape(c))
            i += 1
    return "".join(out)


class IgnoreRule:
    """One pattern line from an ignore file rooted at ``base`` (the
    ignore file's directory, relative to the walk root, '' for root)."""

    __slots__ = ("negation", "dir_only", "regex", "base")

    def __init__(self, line: str, base: str = ""):
        self.negation = line.startswith("!")
        if self.negation:
            line = line[1:]
        line = line.rstrip()  # unescaped trailing spaces are ignored
        self.dir_only = line.endswith("/")
        line = line.rstrip("/")
        # '/' anywhere except the (stripped) end anchors to base
        anchored = line.startswith("/") or "/" in line
        line = line.lstrip("/")
        src = _translate(line)
        if not anchored:
            src = "(?:[^/]+/)*" + src
        self.base = base
        self.regex = re.compile("^" + src + "$")

    def match(self, rel_path: str, is_dir: bool) -> bool:
        """rel_path is relative to the WALK ROOT, /-separated."""
        if self.dir_only and not is_dir:
            return False
        if self.base:
            prefix = self.base + "/"
            if not rel_path.startswith(prefix):
                return False
            rel_path = rel_path[len(prefix) :]
        return bool(self.regex.match(rel_path))


def parse_ignore_file(path: str, base: str) -> list[IgnoreRule]:
    try:
        with open(path, encoding="utf-8", errors="replace") as f:
            lines = f.read().splitlines()
    except OSError:
        return []
    rules = []
    for line in lines:
        stripped = line.strip()
        if not stripped or stripped.startswith("#"):
            continue
        rules.append(IgnoreRule(line.rstrip("\n"), base))
    return rules


class IgnoreStack:
    """Accumulates rules while walking; answers 'is this path ignored'.
    Rule precedence: later files (deeper dirs) and later lines override
    earlier ones — the last matching rule decides (git semantics)."""

    IGNORE_FILENAMES = (".gitignore", ".ignore")

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        self.rules: list[IgnoreRule] = []
        exclude = os.path.join(self.root, ".git", "info", "exclude")
        if os.path.isfile(exclude):
            self.rules.extend(parse_ignore_file(exclude, ""))

    def enter_dir(self, abs_dir: str) -> None:
        rel = os.path.relpath(abs_dir, self.root).replace(os.sep, "/")
        base = "" if rel == "." else rel
        for name in self.IGNORE_FILENAMES:
            p = os.path.join(abs_dir, name)
            if os.path.isfile(p):
                self.rules.extend(parse_ignore_file(p, base))

    def is_ignored(self, abs_path: str, is_dir: bool) -> bool:
        rel = os.path.relpath(abs_path, self.root).replace(os.sep, "/")
        decision = False
        for rule in self.rules:
            if rule.match(rel, is_dir):
                decision = not rule.negation
        return decision
