"""Reference-compatible CLI over the Ray Data engine.

Mirrors the ad-si/Textalyzer subcommand surface (textalyzer/src/types.rs
:7-38, main.rs) so a user of the reference can switch:

    python -m textalyzer_ray histogram <filepath> [--json]
    python -m textalyzer_ray duplication [--min-lines N] [--files-only]
        [--json] <paths...>
    python -m textalyzer_ray line-length [--json] <paths...>

File handling parity (file_utils.rs):
- directories are walked recursively; ``.git`` directories are skipped
  (we do not honor .gitignore — the reference uses the ``ignore`` crate;
  documented deviation, hidden files are still included like the
  reference's non-hidden default... the reference's WalkBuilder default
  skips hidden files, we match that);
- files with NUL bytes or invalid UTF-8 are dropped silently
  (file_utils.rs:134-144,176-177);
- ``--min-lines`` defaults to 3 (types.rs:21-22 — the README's claim of
  2 is contradicted by the code; code wins, SURVEY.md M4).

The CLI owns the Ray session (guarded init; the library never inits).
Small inputs run the pure-core oracle path directly — spinning a Ray
cluster for one file would be absurd — and large corpora (>= --ray-rows
files) run the distributed pipelines. Both paths share the same core
semantics, so output is identical.
"""

from __future__ import annotations

import argparse
import os
import sys


def find_all_files(root: str, respect_ignores: bool = True) -> list[str]:
    """Recursive walk matching the reference's ignore-crate WalkBuilder
    (file_utils.rs:60-97): skips .git and hidden entries and honors
    .gitignore / .ignore / .git/info/exclude patterns (minimal matcher,
    core/ignore.py; ignored directories are pruned, so negations cannot
    re-include inside an excluded dir — git semantics)."""
    from textalyzer_ray.core.ignore import IgnoreStack

    stack = IgnoreStack(root) if respect_ignores else None
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        if stack is not None:
            stack.enter_dir(dirpath)
        keep = []
        for d in sorted(dirnames):
            if d == ".git" or d.startswith("."):
                continue
            if stack is not None and stack.is_ignored(
                os.path.join(dirpath, d), True
            ):
                continue
            keep.append(d)
        dirnames[:] = keep
        for f in sorted(filenames):
            if f.startswith("."):
                continue
            p = os.path.join(dirpath, f)
            if stack is not None and stack.is_ignored(p, False):
                continue
            out.append(p)
    return out


def load_files(paths: list[str]) -> list[tuple[str, str]]:
    """(name, text) entries; binary (NUL) and invalid-UTF-8 dropped
    silently (file_utils.rs:99-180)."""
    entries = []
    for p in paths:
        try:
            raw = open(p, "rb").read()
        except OSError:
            continue
        if b"\x00" in raw:
            continue
        try:
            entries.append((p, raw.decode("utf-8")))
        except UnicodeDecodeError:
            continue
    return entries


def collect_paths(args_paths: list[str]) -> list[str]:
    files = []
    for p in args_paths:
        if os.path.isdir(p):
            files.extend(find_all_files(p))
        elif os.path.isfile(p):
            files.append(p)
    return files


def cmd_histogram(args) -> int:
    from textalyzer_ray.core.textmetrics import frequency_map
    from textalyzer_ray.functions.render import format_freq_map, freq_json

    try:
        text = open(args.filepath, encoding="utf-8").read()
    except (OSError, UnicodeDecodeError) as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1
    fm = frequency_map(text)
    print(freq_json(fm) if args.json else format_freq_map(fm))
    return 0


def _docs_dataset(entries: list[tuple[str, str]]):
    import pyarrow as pa
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return rd.from_arrow(
        pa.table(
            {
                "url": [n for n, _ in entries],
                "text": [t for _, t in entries],
            }
        )
    )


def cmd_duplication(args) -> int:
    from textalyzer_ray.functions.render import duplication_json

    files = collect_paths(args.paths)
    if not files:
        print("No valid files found in the specified paths", file=sys.stderr)
        return 1
    entries = load_files(files)
    use_ray = len(entries) >= args.ray_rows
    if use_ray:
        from textalyzer_ray.pipelines.duplication import (
            find_duplicate_lines,
            multi_line_duplications,
        )

        ds = _docs_dataset(entries)
        if args.min_lines <= 1:
            rows = find_duplicate_lines(ds).take_all()
            dups = [
                (
                    r["content"],
                    [(l["path"], int(l["line"])) for l in r["locations"]],
                )
                for r in rows
            ]
        else:
            dups = multi_line_duplications(ds, min_lines=args.min_lines)
    else:
        from textalyzer_ray.core.duplication import duplication_pipeline

        dups = duplication_pipeline(entries, min_lines=args.min_lines)

    if args.json:
        print(duplication_json(dups))
    elif args.files_only:
        for content, locs in dups:
            for path, line in locs:
                print(f"{path}:{line}")
    else:
        for content, locs in dups:
            print("=" * 40)
            print(content)
            for path, line in locs:
                print(f"  {path}:{line}")
    return 0


def cmd_line_length(args) -> int:
    from textalyzer_ray.functions.render import (
        format_line_length_histogram,
        line_length_json,
    )

    files = collect_paths(args.paths)
    entries = load_files(files)
    use_ray = len(entries) >= args.ray_rows
    if use_ray:
        from textalyzer_ray.pipelines.line_length import line_length_histogram

        ds = _docs_dataset(entries)
        rows = line_length_histogram(ds).take_all()
        histogram = {int(r["length"]): int(r["count"]) for r in rows}
    else:
        from textalyzer_ray.core.textmetrics import display_width, split_lines

        histogram: dict[int, int] = {}
        for _, text in entries:
            for line in split_lines(text):
                w = display_width(line)
                histogram[w] = histogram.get(w, 0) + 1
    print(line_length_json(histogram) if args.json else format_line_length_histogram(histogram))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="textalyzer_ray")
    sub = p.add_subparsers(dest="command", required=True)

    h = sub.add_parser("histogram", help="word frequency histogram of a file")
    h.add_argument("filepath")
    h.add_argument("--json", action="store_true")
    h.set_defaults(fn=cmd_histogram)

    d = sub.add_parser("duplication", help="find duplicated text blocks")
    d.add_argument("paths", nargs="+")
    d.add_argument("--min-lines", type=int, default=3)
    d.add_argument("--files-only", action="store_true")
    d.add_argument("--json", action="store_true")
    d.add_argument("--ray-rows", type=int, default=200, help=argparse.SUPPRESS)
    d.set_defaults(fn=cmd_duplication)

    l = sub.add_parser("line-length", help="line length histogram")
    l.add_argument("paths", nargs="+")
    l.add_argument("--json", action="store_true")
    l.add_argument("--ray-rows", type=int, default=200, help=argparse.SUPPRESS)
    l.set_defaults(fn=cmd_line_length)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
