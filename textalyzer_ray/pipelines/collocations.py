"""Collocation extraction: PMI-style lift scores for corpus bigrams.

The reference stops at plain frequency tables (SURVEY.md §2.5 G1 and
the bigram extension); collocation mining — which adjacent word pairs
occur together far more often than their unigram frequencies predict —
is the classic next step (Church & Hanks 1990 pointwise mutual
information). We report the raw PMI *lift* ratio

    lift(x, y) = (c_xy * N) / (c_x * c_y)

(PMI = log2(lift); log is monotone, so ranking by lift is ranking by
PMI, and the ratio is ONE int/int double division — IEEE-identical in
numpy, Python and DuckDB (CLAUDE.md), so even the float column
hash-matches the SQL oracle. The integer products stay in int64; at a
100 TB corpus (N ~ 1e13) the numerator would need 128-bit or log-space
math — the filter-first shape below is unchanged, only the final
arithmetic widens).

Scale shape: ONE tokenize pass emits unigram, bigram AND total-token
partials as a single (w1, w2) keyed stream — bigrams as (w1, w2),
unigrams as (word, ''), the corpus total as ('', '') — '' can never be
a token (the sentinel-row pattern), so one ``key_counts`` tree merge
aggregates all three exactly. Bigrams below ``min_count`` are dropped
BEFORE any join (the filter-before-join shape: survivors are the
collocation candidates, orders of magnitude fewer than raw bigrams).
Unigram counts are attached either by broadcasting the vocabulary
(measured rows below ``broadcast_threshold``) or, at scale, by two
join-free union-tag exchanges keyed on w1 then w2 (the host_pagerank
pattern — robust to sparse hash partitions where acero joins reject
schema-less empty blocks, CLAUDE.md).
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_COUNTS_SCHEMA = pa.schema(
    [
        pa.field("w1", pa.string()),
        pa.field("w2", pa.string()),
        pa.field("n", pa.int64()),
    ]
)

OUT_SCHEMA = pa.schema(
    [
        pa.field("w1", pa.string()),
        pa.field("w2", pa.string()),
        pa.field("c_xy", pa.int64()),
        pa.field("c_x", pa.int64()),
        pa.field("c_y", pa.int64()),
        pa.field("lift", pa.float64()),
    ]
)


def _pair_unigram_partial(t: pa.Table, text_col: str) -> pa.Table:
    """One tokenize pass -> (w1, w2, n) partial counts: real bigrams,
    unigrams as (word, ''), the batch token total as ('', '')."""
    from textalyzer_ray.stages.tokenize import _flat_tokens

    tokens, parents = _flat_tokens(t, text_col)
    if len(tokens) == 0:
        return _COUNTS_SCHEMA.empty_table()
    df = pl.from_arrow(pa.table({"doc": parents, "word": tokens}))
    uni = (
        df.group_by("word")
        .len()
        .select(
            pl.col("word").alias("w1"),
            pl.lit("").alias("w2"),
            pl.col("len").cast(pl.Int64).alias("n"),
        )
    )
    big = (
        df.with_columns(pl.col("word").shift(-1).over("doc").alias("next"))
        .drop_nulls("next")
        .group_by(["word", "next"])
        .len()
        .select(
            pl.col("word").alias("w1"),
            pl.col("next").alias("w2"),
            pl.col("len").cast(pl.Int64).alias("n"),
        )
    )
    total = pl.DataFrame(
        {"w1": [""], "w2": [""], "n": [len(tokens)]}
    ).with_columns(pl.col("n").cast(pl.Int64))
    return pl.concat([big, uni, total]).to_arrow().cast(_COUNTS_SCHEMA)


def _lift_table(t: pl.DataFrame) -> pa.Table:
    """(w1, w2, c_xy, c_x, c_y, n_tokens) -> OUT_SCHEMA with the lift
    ratio as one int/int double division (cross-engine exact)."""
    import numpy as np

    num = (t["c_xy"] * t["n_tokens"]).to_numpy().astype(np.int64)
    den = (t["c_x"] * t["c_y"]).to_numpy().astype(np.int64)
    lift = num / den
    return pa.table(
        {
            "w1": t["w1"].to_arrow(),
            "w2": t["w2"].to_arrow(),
            "c_xy": t["c_xy"].to_arrow(),
            "c_x": t["c_x"].to_arrow(),
            "c_y": t["c_y"].to_arrow(),
            "lift": pa.array(lift, pa.float64()),
        },
        schema=OUT_SCHEMA,
    )


def pmi_collocations(
    ds_docs: Dataset,
    min_count: int = 5,
    text_col: str = "text",
    broadcast_threshold: int = 2_000_000,
) -> Dataset:
    """(w1, w2, c_xy, c_x, c_y, lift) for every adjacent bigram with
    corpus count >= ``min_count``, sorted (w1, w2) — a key sort, so the
    output set and order are float-free deterministic.

    ``broadcast_threshold`` picks the unigram-attach mechanism from the
    MEASURED vocabulary size: below it the (word, count) table ships
    once via ray.put and one task-pool pass annotates both columns
    (zero extra shuffle); above it two union-tag exchanges keyed on w1
    then w2 attach the counts join-free. Both paths are pinned equal in
    tests/test_pipelines_collocations.py."""
    from textalyzer_ray.stages.groups import key_counts

    merged = key_counts(
        ds_docs.select_columns([text_col]).map_batches(
            lambda t: _pair_unigram_partial(t, text_col),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["w1", "w2"],
        sum_cols=["n"],
    ).materialize()  # consumed up to three times below

    def sentinel_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(pc.equal(t["w1"], ""), pc.equal(t["w2"], "")))

    sent = merged.map_batches(
        sentinel_only, batch_format="pyarrow"
    ).take_all()
    n_tokens = int(sent[0]["sum_n"]) if sent else 0
    if n_tokens == 0:
        import ray.data as rd

        return rd.from_arrow(OUT_SCHEMA.empty_table())

    def split_uni(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(t["w2"], ""), pc.not_equal(t["w1"], "")
        )
        u = t.filter(keep)
        return pa.table({"word": u["w1"], "c": u["sum_n"]})

    def split_big(t: pa.Table) -> pa.Table:
        b = t.filter(
            pc.and_(
                pc.not_equal(t["w2"], ""),
                pc.greater_equal(t["sum_n"], min_count),
            )
        )
        return pa.table({"w1": b["w1"], "w2": b["w2"], "c_xy": b["sum_n"]})

    uni = merged.map_batches(split_uni, batch_format="pyarrow")
    big = merged.map_batches(split_big, batch_format="pyarrow")

    n_vocab = uni.count()
    if n_vocab <= broadcast_threshold:
        out = _attach_broadcast(big, uni, n_tokens)
    else:
        out = _attach_distributed(big, uni, n_tokens, n_vocab)
    return out.sort(["w1", "w2"])


def _attach_broadcast(big: Dataset, uni: Dataset, n_tokens: int) -> Dataset:
    """Small-vocabulary path: (word, c) ships once; one task-pool pass
    joins c_x and c_y and computes lift (per-worker object cache, the
    broadcast_join pattern)."""
    import ray

    vocab_ref = ray.put(
        pa.concat_tables(ray.get(uni.to_arrow_refs()))
    )

    def annotate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        from textalyzer_ray.stages.groups import _worker_object_cache

        cache = _worker_object_cache()
        ck = vocab_ref.hex()
        vm = cache.get(ck)
        if vm is None:
            vm = cache[ck] = pl.from_arrow(ray.get(vocab_ref))
        df = (
            pl.from_arrow(t)
            .join(vm.rename({"word": "w1", "c": "c_x"}), on="w1", how="inner")
            .join(vm.rename({"word": "w2", "c": "c_y"}), on="w2", how="inner")
            .with_columns(pl.lit(n_tokens).cast(pl.Int64).alias("n_tokens"))
        )
        return _lift_table(df)

    return big.map_batches(annotate, batch_format="pyarrow")


def _attach_distributed(
    big: Dataset, uni: Dataset, n_tokens: int, n_uni: int
) -> Dataset:
    """Large-vocabulary path: two join-free ``union_tag_lookup``
    exchanges (pipelines/joins.py), keyed on w1 then w2 — no acero
    join, so sparse partitions with schema-less empty blocks are
    harmless (CLAUDE.md)."""
    from textalyzer_ray.pipelines.joins import union_tag_lookup
    from textalyzer_ray.stages.groups import partitions_for

    parts = partitions_for(n_uni)

    def uni_as(key: str) -> Dataset:
        return uni.map_batches(
            lambda t, k=key: pa.table({k: t["word"], "c": t["c"]}),
            batch_format="pyarrow",
        )

    r1 = union_tag_lookup(big, uni_as("w1"), "w1", "c", "c_x", parts)
    r2 = union_tag_lookup(r1, uni_as("w2"), "w2", "c", "c_y", parts)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        df = pl.from_arrow(t).with_columns(
            pl.lit(n_tokens).cast(pl.Int64).alias("n_tokens")
        )
        return _lift_table(df)

    return r2.map_batches(finish, batch_format="pyarrow")
