"""Corpus word-frequency histogram (SURVEY.md G1/O2; reference:
textalyzer/src/frequency.rs:34-45 per-doc + corpus generalization).

Shape: ``map_batches(partial_word_counts)`` (combiner — one row per
distinct word per batch) -> ``groupby("word").sum("count")`` (the only
shuffle; moves partials, not occurrences) -> deterministic JSON order
``(count desc, word asc)`` (lib.rs:45-47).

Skew: stop-words are hot keys, but the partial combine bounds each
word's shuffle rows by the block count. ``salted=True`` demonstrates the
two-stage salted merge for when even that is too hot (north_star:
"salted keys to defuse skew"): stage 1 groups on (word, salt) with salt
= a deterministic block-derived int, stage 2 merges the <=S partials per
word. On this workload the plain partial+final is faster; salting is the
escape hatch for 10^12-scale hot domains.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

from textalyzer_ray.stages.tokenize import partial_word_counts


def word_histogram(
    ds: Dataset,
    text_col: str = "text",
    sort: bool = True,
    salted: bool = False,
    num_salts: int = 16,
) -> Dataset:
    """Dataset[.., text] -> Dataset[word, count] (count desc, word asc)."""
    partials = ds.map_batches(
        lambda t: partial_word_counts(t, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if not salted:
        # vectorized merge (stages.groups): Ray's groupby finalizes in
        # Python per group (~0.1 ms/group), which dominates for a real
        # vocabulary; the polars tree merge has no per-group cost.
        from textalyzer_ray.stages.groups import key_counts

        out = key_counts(partials, ["word"], sum_cols=["count"]).map_batches(
            lambda t: pa.table({"word": t["word"], "count": t["sum_count"]}),
            batch_format="pyarrow",
        )
        if sort:
            out = out.sort(["count", "word"], descending=[True, False])
        return out
    if salted:
        def add_salt(t: pa.Table) -> pa.Table:
            # salt must vary WITHIN a key to spread a hot word across
            # reducers: derive it from the batch content position (one
            # partial row per word per batch -> salts rotate per batch),
            # deterministically, no RNG.
            import numpy as np

            base = int(pc.sum(pc.binary_length(t["word"])).as_py() or 0)
            salt = (base + np.arange(t.num_rows, dtype=np.int64)) % num_salts
            return t.append_column("salt", pa.array(salt.astype(np.int32)))

        stage1 = (
            partials.map_batches(add_salt, batch_format="pyarrow")
            .groupby(["word", "salt"])
            .aggregate(Sum("count", alias_name="count"))
        )
        out = stage1.groupby("word").aggregate(Sum("count", alias_name="count"))
    if sort:
        out = out.sort(["count", "word"], descending=[True, False])
    return out


def word_histogram_by_lang(
    ds: Dataset, text_col: str = "text", lang_col: str = "lang"
) -> Dataset:
    """Per-language histogram: partial counts keep the lang key."""

    def partials(t: pa.Table) -> pa.Table:
        import polars as pl

        from textalyzer_ray.stages.tokenize import _flat_tokens

        tokens, parents = _flat_tokens(t, text_col)
        langs = t[lang_col]
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        tbl = pa.table({"lang": langs.take(parents), "word": tokens})
        return (
            pl.from_arrow(tbl)
            .group_by(["lang", "word"])
            .len()
            .rename({"len": "count"})
            .with_columns(pl.col("count").cast(pl.Int64))
            .to_arrow()
            .cast(
                pa.schema(
                    [
                        pa.field("lang", pa.string()),
                        pa.field("word", pa.string()),
                        pa.field("count", pa.int64()),
                    ]
                )
            )
        )

    from textalyzer_ray.stages.groups import key_counts

    p = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    return (
        key_counts(p, ["lang", "word"], sum_cols=["count"])
        .map_batches(
            lambda t: pa.table(
                {"lang": t["lang"], "word": t["word"], "count": t["sum_count"]}
            ),
            batch_format="pyarrow",
        )
        .sort(["lang", "count", "word"], descending=[False, True, False])
    )
