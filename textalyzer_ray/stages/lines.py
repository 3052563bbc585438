"""Line explosion and display-width stages.

``explode_lines`` reproduces Rust ``str::lines`` semantics exactly
(file_utils.rs:25, duplication.rs:71 — see core.textmetrics.split_lines)
but vectorized with polars: ``\\r\\n -> \\n`` (lines() strips a \\r only
immediately before a \\n), strip ONE trailing ``\\n``, split, explode.

``line_widths`` computes wcwidth display columns (line_length.rs:31)
with an ASCII fast path (width == char length when the line is ASCII
without control chars) and a Python fallback only for the non-ASCII
minority.

``partial_width_histogram`` is the combiner for the line-length
histogram (SURVEY.md G3): the width domain is tiny (0..~500), so each
batch emits at most a few hundred (length, count) rows and the final
groupby is negligible — no full shuffle of line rows.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from textalyzer_ray.core.textmetrics import display_width

_CONTROL_RE = r"[\x00-\x1f\x7f]"


def explode_lines(
    table: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    trim: bool = False,
    drop_empty: bool = False,
) -> pa.Table:
    """(id, line_number:int32 1-based, content) rows.

    ``trim``/``drop_empty`` mirror merge_file_lines (file_utils.rs:11-55):
    content trimmed, lines empty-after-trim dropped. With both False this
    is the raw explosion used by the line-length histogram (all lines
    counted, line_length.rs:30-33).
    """
    df = pl.from_arrow(table.select([id_col, text_col]))
    df = df.filter(pl.col(text_col) != "")  # "" -> no lines (Rust lines())
    df = df.with_columns(
        pl.col(text_col)
        .str.replace_all("\r\n", "\n", literal=True)
        .str.replace(r"\n$", "")
        .str.split("\n")
        .alias("__lines")
    )
    df = (
        df.select([id_col, "__lines"])
        # current polars behavior, pinned: Polars 2.0 flips the default
        # and the warning otherwise fires once per batch
        .explode("__lines", empty_as_null=True)
        .with_columns(
            (pl.col("__lines").cum_count().over(id_col)).cast(pl.Int32).alias("line_number")
        )
        .rename({"__lines": "content"})
    )
    if trim or drop_empty:
        trimmed = pl.col("content").str.strip_chars()
        if drop_empty:
            df = df.filter(trimmed.str.len_bytes() > 0)
        if trim:
            df = df.with_columns(pl.col("content").str.strip_chars())
    out = df.select([id_col, "line_number", "content"]).to_arrow()
    # polars emits large_string; normalize for downstream arrow kernels
    return out.cast(
        pa.schema(
            [
                pa.field(id_col, table.schema.field(id_col).type),
                pa.field("line_number", pa.int32()),
                pa.field("content", pa.string()),
            ]
        )
    )


def line_widths(table: pa.Table, content_col: str = "content") -> pa.Table:
    """Append ``width:int32`` display-column widths (wcwidth semantics)."""
    col = table[content_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False)
    n_bytes = pc.binary_length(col).to_numpy(zero_copy_only=False)
    has_ctl = pc.match_substring_regex(col, _CONTROL_RE).to_numpy(zero_copy_only=False)
    widths = n_chars.astype(np.int32)
    slow = (n_bytes != n_chars) | has_ctl
    if slow.any():
        idx = np.nonzero(slow)[0]
        vals = col.take(pa.array(idx)).to_pylist()
        for j, s in zip(idx, vals):
            widths[j] = display_width(s if s is not None else "")
    return table.append_column("width", pa.array(widths, pa.int32()))


def partial_width_histogram(table: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-batch partial line-length histogram (length, count:int64) —
    combiner for SURVEY.md G3. Uses a synthetic id to explode."""
    with_id = table.select([text_col]).append_column(
        "__rid", pa.array(np.arange(table.num_rows, dtype=np.int64))
    )
    lines = explode_lines(with_id, id_col="__rid", text_col=text_col)
    widths = line_widths(lines)["width"]
    vc = pc.value_counts(widths.combine_chunks() if isinstance(widths, pa.ChunkedArray) else widths)
    return pa.table({"length": vc.field("values"), "count": vc.field("counts")})
