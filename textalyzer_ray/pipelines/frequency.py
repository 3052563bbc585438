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
    distributed: bool | None = None,
) -> Dataset:
    """Dataset[.., text] -> Dataset[word, count] (count desc, word asc).

    ``distributed=None`` (default, r3): AUTO — key_counts probes the
    measured partial cardinality and picks the merge itself (tree below
    its auto_threshold, key-aligned hash partition above), so a 10^7+
    vocabulary can never silently funnel into the single-block merge
    while a 31-word vocab never pays the extra shuffle (measured 2.6s
    on 143 MB). Explicit True/False still forces a mechanism."""
    partials = ds.map_batches(
        lambda t: partial_word_counts(t, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if not salted:
        # vectorized merge (stages.groups): Ray's groupby finalizes in
        # Python per group (~0.1 ms/group), which dominates for a real
        # vocabulary; the polars merge has no per-group cost and the
        # distributed (key-aligned) final has no single-node merge.
        from textalyzer_ray.stages.groups import key_counts

        out = key_counts(
            partials, ["word"], sum_cols=["count"], distributed=distributed
        ).map_batches(
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


def word_doc_frequency(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    sort: bool = True,
    distributed: bool | None = None,
) -> Dataset:
    """(word, df) — number of documents containing each word (the IDF
    numerator for TF-IDF). Partial stage emits per-batch DISTINCT
    (doc, word) pairs collapsed to per-word doc counts (documents never
    span batches, so batch-local distinct is globally correct); merge is
    the vectorized tree (stages.groups). ``distributed=True`` keeps the
    merged table partitioned (key-aligned) for web-scale vocabularies;
    ``sort=False`` skips the presentation sort (join consumers)."""
    import polars as pl

    from textalyzer_ray.stages.groups import key_counts
    from textalyzer_ray.stages.tokenize import exploded_tokens

    def partial(t: pa.Table) -> pa.Table:
        pairs = exploded_tokens(t, id_col, text_col)
        df = (
            pl.from_arrow(pairs)
            .unique([id_col, "word"])
            .group_by("word")
            .len()
            .rename({"len": "df"})
            .with_columns(pl.col("df").cast(pl.Int64))
        )
        return df.select(["word", "df"]).to_arrow().cast(
            pa.schema([pa.field("word", pa.string()), pa.field("df", pa.int64())])
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    df_schema = pa.schema([pa.field("word", pa.string()), pa.field("df", pa.int64())])
    out = key_counts(
        partials, ["word"], sum_cols=["df"], distributed=distributed
    ).map_batches(
        lambda t: pa.table({"word": t["word"], "df": t["sum_df"]}).cast(df_schema),
        batch_format="pyarrow",
    )
    if sort:
        out = out.sort(["df", "word"], descending=[True, False])
    return out


def bigram_histogram(ds: Dataset, text_col: str = "text") -> Dataset:
    """(bigram, count) over consecutive token pairs within each document
    (reference tokenization; pairs never cross documents)."""
    import polars as pl

    from textalyzer_ray.stages.groups import key_counts
    from textalyzer_ray.stages.tokenize import _flat_tokens

    def partial(t: pa.Table) -> pa.Table:
        tokens, parents = _flat_tokens(t, text_col)
        df = pl.from_arrow(pa.table({"doc": parents, "word": tokens}))
        df = df.with_columns(
            pl.col("word").shift(-1).over("doc").alias("next")
        ).drop_nulls("next")
        df = (
            df.with_columns(
                (pl.col("word") + pl.lit(" ") + pl.col("next")).alias("bigram")
            )
            .group_by("bigram")
            .len()
            .rename({"len": "count"})
            .with_columns(pl.col("count").cast(pl.Int64))
        )
        return df.select(["bigram", "count"]).to_arrow().cast(
            pa.schema(
                [pa.field("bigram", pa.string()), pa.field("count", pa.int64())]
            )
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return (
        key_counts(partials, ["bigram"], sum_cols=["count"])
        .map_batches(
            lambda t: pa.table({"bigram": t["bigram"], "count": t["sum_count"]}),
            batch_format="pyarrow",
        )
        .sort(["count", "bigram"], descending=[True, False])
    )


def distinct_word_count(ds: Dataset, text_col: str = "text") -> Dataset:
    """Exact global distinct-token count -> one row (n_distinct_words)."""
    out = word_histogram(ds, text_col=text_col, sort=False)

    def count_rows(t: pa.Table) -> pa.Table:
        return pa.table({"n_distinct_words": pa.array([t.num_rows], pa.int64())})

    # word_histogram's merged result is a single block -> one row out
    return out.map_batches(count_rows, batch_format="pyarrow", batch_size=None)


def approx_distinct_words(ds: Dataset, text_col: str = "text", p: int = 12) -> int:
    """HLL approximate distinct tokens: one sketch per batch, merged on
    the driver (blocks x 4 KiB — the mergeable-sketch pattern)."""
    import numpy as np

    from textalyzer_ray.stages.sketch import HyperLogLog, hll_partial_batch

    partials = ds.map_batches(
        lambda t: hll_partial_batch(t, text_col, p),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    regs = [
        np.frombuffer(r["registers"], dtype=np.uint8)
        for r in partials.take_all()
    ]
    hll = HyperLogLog(p)
    if not regs:
        return 0
    return hll.estimate(HyperLogLog.merge(regs))


def top_words_per_group(
    ds: Dataset, group_col: str = "lang", text_col: str = "text", k: int = 3
) -> Dataset:
    """Top-k words per group by (count desc, word asc) with rank —
    window-function analogue (few groups -> per-group head is cheap)."""
    import polars as pl

    hist = word_histogram_by_lang(ds, text_col=text_col, lang_col=group_col)

    def topk(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t)
            .sort([group_col, "count", "word"], descending=[False, True, False])
            .with_columns(
                (pl.col("word").cum_count().over(group_col)).cast(pl.Int64).alias("rank")
            )
            .filter(pl.col("rank") <= k)
        )
        return df.select([group_col, "word", "count", "rank"]).to_arrow().cast(
            pa.schema(
                [
                    pa.field(group_col, pa.string()),
                    pa.field("word", pa.string()),
                    pa.field("count", pa.int64()),
                    pa.field("rank", pa.int64()),
                ]
            )
        )

    # key-aligned on the group: every group's words land wholly in one
    # block, so the per-block polars window is globally correct — no
    # single-block funnel even at web-scale vocabularies (VERDICT r1 #7)
    from textalyzer_ray.stages.groups import grouped_apply

    return grouped_apply(hist, [group_col], topk, num_partitions=4).sort(
        [group_col, "rank"]
    )


def tfidf_top_terms(
    ds: Dataset,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Per-document top-k TF-IDF terms -> (doc_id, term, tfidf, rank).

    Fully distributed — no driver vocabulary (VERDICT r1 #4): per-doc
    (doc_id, term, tf) rows are one vectorized polars pass per batch
    (documents never span batches, so batch-local tf is exact); the
    corpus df table STAYS a dataset and meets the tf rows through a
    hash-partitioned join on the term; scoring is a numpy kernel; the
    per-doc top-k window runs in doc-keyed key-aligned blocks. The only
    value on the driver is the scalar ``n_docs``. Ties break
    (tfidf desc, term asc); score = tf * ln(n_docs / df).
    """
    import numpy as np
    import polars as pl

    from textalyzer_ray.pipelines.joins import bucketed_join
    from textalyzer_ray.sources.tables import cluster_cpus
    from textalyzer_ray.stages.groups import grouped_apply
    from textalyzer_ray.stages.tokenize import exploded_tokens

    n_docs = ds.count()
    from textalyzer_ray.stages.groups import id_type_of

    id_type = id_type_of(ds, id_col)
    tf_schema = pa.schema(
        [
            pa.field(id_col, id_type),
            pa.field("term", pa.string()),
            pa.field("tf", pa.int64()),
        ]
    )

    def tf_partial(t: pa.Table) -> pa.Table:
        pairs = exploded_tokens(t, id_col, text_col)
        out = (
            pl.from_arrow(pairs)
            .group_by([id_col, "word"])
            .len()
            .rename({"word": "term", "len": "tf"})
            .with_columns(pl.col("tf").cast(pl.Int64))
        )
        return out.select([id_col, "term", "tf"]).to_arrow().cast(tf_schema)

    doc_tf = ds.map_batches(tf_partial, batch_format="pyarrow", zero_copy_batch=True)
    dfds = word_doc_frequency(ds, text_col=text_col, id_col=id_col, sort=False)
    joined = bucketed_join(
        doc_tf,
        dfds,
        left_key="term",
        right_key="word",
        num_partitions=max(cluster_cpus(), 2),
    )

    def score(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                id_col: t[id_col],
                "term": t["term"],
                "tfidf": pa.array(tf * np.log(n_docs / dfv), pa.float64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow")
    out_schema = pa.schema(
        [
            pa.field(id_col, id_type),
            pa.field("term", pa.string()),
            pa.field("tfidf", pa.float64()),
            pa.field("rank", pa.int64()),
        ]
    )

    def topk_block(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t)
            .sort([id_col, "tfidf", "term"], descending=[False, True, False])
            .with_columns(
                pl.col("term").cum_count().over(id_col).cast(pl.Int64).alias("rank")
            )
            .filter(pl.col("rank") <= k)
        )
        return df.to_arrow().cast(out_schema)

    return grouped_apply(scored, [id_col], topk_block).sort([id_col, "rank"])


def doc_top_bigram(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> Dataset:
    """Per-document most frequent token bigram -> (doc_id, bigram,
    count); ties break bigram-ascending. The per-doc repetition signal
    (a doc dominated by one bigram is boilerplate/spam — the
    Gopher-family repetition filter's integer core, exact enough for a
    SQL window oracle). Docs with < 2 tokens emit nothing. Fully
    vectorized: one polars window pass per batch (docs never span
    batches)."""
    import polars as pl

    from textalyzer_ray.stages.tokenize import exploded_tokens

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("bigram", pa.string()),
            pa.field("count", pa.int64()),
        ]
    )

    def top_per_doc(t: pa.Table) -> pa.Table:
        pairs = exploded_tokens(t, id_col, text_col)
        df = pl.from_arrow(pairs)
        if df.height == 0:
            return out_schema.empty_table()
        out = (
            df.with_columns(pl.col("word").shift(-1).over(id_col).alias("next"))
            .drop_nulls("next")
            .with_columns(
                (pl.col("word") + pl.lit(" ") + pl.col("next")).alias("bigram")
            )
            .group_by([id_col, "bigram"])
            .len()
            .rename({"len": "count"})
            .sort([id_col, "count", "bigram"], descending=[False, True, False])
            .group_by(id_col, maintain_order=True)
            .head(1)
            .with_columns(pl.col("count").cast(pl.Int64))
        )
        return out.select([id_col, "bigram", "count"]).to_arrow().cast(out_schema)

    return ds.map_batches(
        top_per_doc, batch_format="pyarrow", zero_copy_batch=True
    ).sort(id_col)


# GPT-2-style pre-tokenization classes, restricted to RE2 syntax (no
# lookahead) so the exact same pattern runs in Arrow's
# count_substring_regex and DuckDB's regexp_extract_all: letter runs,
# digit runs, and runs of anything else that isn't whitespace.
BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\x0b]+"


def bpe_token_counts(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> Dataset:
    """(doc_id, n_bpe_tokens): per-document count of BPE-style
    pre-tokenizer matches — the cheap token-budget estimator a training
    pipeline runs over every candidate document. One vectorized RE2 pass
    per batch (pc.count_substring_regex), no shuffle, no Python loop."""

    def count(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t[text_col], BPE_PRETOKEN_RE)
        return pa.table(
            {
                id_col: t[id_col],
                "n_bpe_tokens": pc.cast(n, pa.int64()),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow").sort(id_col)


def approx_top_words(
    ds: Dataset,
    k: int = 20,
    sketch_size: int = 4096,
    text_col: str = "text",
    oversample: int = 4,
):
    """Top-k words by the two-pass heavy-hitters scheme (Misra-Gries
    '82): pass 1 builds a PER-BLOCK MG summary of at most
    ``sketch_size`` counters (vectorized truncate: drop to the top m
    counters and subtract the (m+1)-th count), so the merge sees at most
    blocks x m rows instead of the vocabulary; pass 2 recounts ONLY the
    top ``oversample*k`` candidates exactly (broadcast semi-join filter
    on the partial counts), so the corpus-wide shuffle carries a few
    thousand rows regardless of vocabulary size.

    Returns ``(Dataset[(word, count)], certified: bool)``. A second
    sentinel accumulates the ACTUAL truncation error E = sum of
    per-block subtracted deltas, so for every word
    ``stored(w) >= true(w) - E``; a word excluded from the candidate
    list therefore has true count <= (stored count at the candidate
    cutoff, 0 if nothing was cut) + E. When the k-th exact candidate
    count beats that displacement bound the result is PROVABLY the
    exact top-k (ties broken word-asc are covered: tied words clear the
    same bound). ``certified=False`` (logged) means the distribution is
    too flat for this sketch size — rerun with a larger one.

    This is the scale path for ``word_histogram``'s top slice: the full
    histogram shuffles the whole vocabulary; this shuffles O(blocks x
    sketch_size) then O(oversample x k)."""
    import polars as pl

    import ray

    from textalyzer_ray.stages.groups import filter_to_keys, key_counts

    m = sketch_size
    summary_schema = pa.schema(
        [pa.field("word", pa.string()), pa.field("count", pa.int64())]
    )

    def mg_partial(t: pa.Table) -> pa.Table:
        pw = partial_word_counts(t, text_col)
        total = int(pc.sum(pw["count"]).as_py() or 0)
        delta = 0
        if pw.num_rows > m:
            df = pl.from_arrow(pw).sort(
                ["count", "word"], descending=[True, False]
            )
            delta = int(df["count"][m])
            df = (
                df.head(m)
                .with_columns((pl.col("count") - delta))
                .filter(pl.col("count") > 0)
            )
            pw = df.to_arrow().cast(summary_schema)
        # sentinels: "" and "\x01" are never tokens (tokens are
        # non-empty letter runs), so they can carry the block token
        # total and the block truncation delta through the same merge
        sent = pa.table(
            {
                "word": pa.array(["", "\x01"]),
                "count": pa.array([total, delta], pa.int64()),
            }
        )
        return pa.concat_tables([pw.cast(summary_schema), sent])

    summaries = ds.map_batches(
        mg_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = key_counts(summaries, ["word"], sum_cols=["count"]).map_batches(
        lambda t: pa.table({"word": t["word"], "count": t["sum_count"]}),
        batch_format="pyarrow",
    ).materialize()  # bounded: <= blocks * sketch_size rows by construction
    sentinels = {
        r["word"]: r["count"]
        for r in merged.map_batches(
            lambda t: t.filter(
                pc.is_in(t["word"], value_set=pa.array(["", "\x01"]))
            ),
            batch_format="pyarrow",
        ).take_all()
    }
    n_total = sentinels.get("", 0)
    err = sentinels.get("\x01", 0)
    cand_rows = (
        merged.map_batches(
            lambda t: t.filter(
                pc.invert(
                    pc.is_in(t["word"], value_set=pa.array(["", "\x01"]))
                )
            ),
            batch_format="pyarrow",
        )
        .sort(["count", "word"], descending=[True, False])
        .limit(oversample * k + 1)
        .take_all()
    )
    cut = len(cand_rows) > oversample * k
    # displacement bound: a word excluded from the candidate list has
    # stored <= the first excluded row's stored count (0 if nothing was
    # cut) and true <= stored + E
    bound = (cand_rows[oversample * k]["count"] if cut else 0) + err
    cands = [r["word"] for r in cand_rows][: oversample * k]

    keyref = ray.put(pa.table({"word": pa.array(cands, pa.string())}))
    partials = ds.map_batches(
        lambda t: partial_word_counts(t, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    exact = key_counts(
        filter_to_keys(partials, ["word"], keyref), ["word"], sum_cols=["count"]
    ).map_batches(
        lambda t: pa.table({"word": t["word"], "count": t["sum_count"]}),
        batch_format="pyarrow",
    )
    top = exact.sort(["count", "word"], descending=[True, False]).limit(k)
    top = top.materialize()
    counts = [r["count"] for r in top.take_all()]
    # certified exact iff no word outside the candidate set could enter
    # the returned list: (a) the k-th returned count must beat the
    # displacement bound; (b) a result SHORTER than k is exact only if
    # the candidate list provably holds the whole vocabulary (no
    # truncation anywhere and no candidate cut); empty corpus is exact.
    if len(counts) == 0:
        certified = n_total == 0
    elif len(counts) < k:
        certified = err == 0 and not cut
    else:
        certified = counts[-1] > bound
    if not certified:
        import logging

        logging.getLogger(__name__).warning(
            "approx_top_words: k-th count %s not above MG bound %s "
            "(sketch_size=%d) — top-k not certified exact",
            counts[-1] if counts else None,
            bound,
            m,
        )
    return top, certified


def count_min_words(
    ds: Dataset,
    depth: int = 4,
    width: int = 16384,
    text_col: str = "text",
) -> Dataset:
    """Count-Min sketch word-count estimation (Cormode & Muthukrishnan
    2005): -> Dataset[word, n, n_cms] per distinct word, sorted by
    word. ``n`` is the exact corpus count; ``n_cms`` is the sketch
    estimate — the min over ``depth`` counter rows addressed by
    Kirsch-Mitzenmacher double hashing of
    ``core.fingerprint.hll_hash64(word)`` (the bloom convention,
    core/bloom.py: h1 = lo32, h2 = hi32 | 1, bucket_i =
    (h1 + i*h2) mod width). The one-sided guarantee n_cms >= n holds
    bit-exactly, and a DuckDB oracle replays the counters from the
    same hash chain.

    Scale shape: the corpus text dies in the word histogram's partial
    combine; everything downstream runs on the DISTINCT-WORD table.
    The counter table is depth x width int64 — the sketch IS the
    bounded state, independent of corpus size — reduced from
    per-block ``np.bincount`` partials (one driver add of sketch-sized
    arrays, the bloom small-path pattern) and broadcast back for the
    vectorized min-gather estimate."""
    import numpy as np
    import ray

    from textalyzer_ray.core.bloom import bloom_positions_array

    counts = word_histogram(
        ds.select_columns([text_col]), text_col=text_col, sort=False
    ).materialize()

    def counter_partial(t: pa.Table) -> pa.Table:
        words = t["word"].to_pylist()
        n = t["count"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = bloom_positions_array(words, width, depth)  # (rows, depth)
        slot = pos + (np.arange(depth, dtype=np.int64) * width)[None, :]
        flat = np.bincount(
            slot.ravel(),
            weights=np.repeat(n, depth).astype(np.float64),
            minlength=depth * width,
        ).astype(np.int64)
        return pa.table({"counters": pa.array([flat.tobytes()], pa.binary())})

    counters = np.zeros(depth * width, dtype=np.int64)
    for row in counts.map_batches(
        counter_partial, batch_format="pyarrow"
    ).take_all():
        counters += np.frombuffer(row["counters"], dtype=np.int64)
    cref = ray.put(counters)

    out_schema = pa.schema(
        [
            pa.field("word", pa.string()),
            pa.field("n", pa.int64()),
            pa.field("n_cms", pa.int64()),
        ]
    )

    def estimate(t: pa.Table) -> pa.Table:
        from textalyzer_ray.stages.groups import _worker_object_cache

        cache = _worker_object_cache()
        ctr = cache.get(cref.hex())
        if ctr is None:
            ctr = cache[cref.hex()] = ray.get(cref)
        words = t["word"].to_pylist()
        n = t["count"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = bloom_positions_array(words, width, depth)
        slot = pos + (np.arange(depth, dtype=np.int64) * width)[None, :]
        est = ctr[slot].min(axis=1)
        return pa.table(
            {
                "word": t["word"].cast(pa.string()),
                "n": pa.array(n),
                "n_cms": pa.array(est),
            },
            schema=out_schema,
        )

    return counts.map_batches(estimate, batch_format="pyarrow").sort("word")


def trending_terms(
    ds: Dataset,
    window_s: int = 60,
    k: int = 3,
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> Dataset:
    """Top-k terms per crawl-time window: (window_start, word, count,
    rank) — what a crawl monitor surfaces as "trending now". The window
    key is epoch SECONDS floored to the window (integer µs division, so
    any engine reproduces the bucket exactly); counts are corpus word
    counts inside the window; rank breaks ties (count desc, word asc).

    Shape: the partial stage tokenizes and pre-aggregates
    (window, word) counts inside each block (hot windows collapse
    before any exchange), the merge is stages.groups.key_counts, and
    the per-window top-k runs key-aligned on the window
    (grouped_apply), so no window's histogram ever funnels through a
    single block or the driver."""
    import numpy as np
    import polars as pl

    from textalyzer_ray.stages.groups import grouped_apply, key_counts
    from textalyzer_ray.stages.tokenize import _flat_tokens

    win_us = int(window_s) * 1_000_000
    part_schema = pa.schema(
        [
            pa.field("window_start", pa.int64()),
            pa.field("word", pa.string()),
            pa.field("count", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        tokens, parents = _flat_tokens(t, text_col)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ws = (ts // win_us) * np.int64(window_s)
        tbl = pa.table(
            {
                "window_start": pa.array(ws, pa.int64()).take(parents),
                "word": tokens,
            }
        )
        return (
            pl.from_arrow(tbl)
            .group_by(["window_start", "word"])
            .len()
            .rename({"len": "count"})
            .with_columns(pl.col("count").cast(pl.Int64))
            .to_arrow()
            .cast(part_schema)
        )

    p = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    hist = key_counts(p, ["window_start", "word"], sum_cols=["count"]).map_batches(
        lambda t: pa.table(
            {
                "window_start": t["window_start"],
                "word": t["word"],
                "count": t["sum_count"],
            },
            schema=part_schema,
        ),
        batch_format="pyarrow",
    )

    out_schema = pa.schema(
        [
            pa.field("window_start", pa.int64()),
            pa.field("word", pa.string()),
            pa.field("count", pa.int64()),
            pa.field("rank", pa.int64()),
        ]
    )

    def topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        return (
            pl.from_arrow(t)
            .sort(
                ["window_start", "count", "word"],
                descending=[False, True, False],
            )
            .with_columns(
                pl.col("word")
                .cum_count()
                .over("window_start")
                .cast(pl.Int64)
                .alias("rank")
            )
            .filter(pl.col("rank") <= k)
            .to_arrow()
            .cast(out_schema)
        )

    return grouped_apply(
        hist, ["window_start"], topk, num_partitions=4
    ).sort(["window_start", "rank"])


def burst_intervals(
    ds: Dataset,
    window_s: int = 60,
    min_windows: int = 2,
    lift_num: int = 2,
    lift_den: int = 1,
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> Dataset:
    """Sustained term bursts over crawl-time windows: maximal runs of
    CONSECUTIVE windows where a word's count strictly exceeds
    ``lift_num/lift_den`` times its corpus-average per-window rate —
    the practical burst detector a crawl monitor runs (the
    two-threshold shape of Kleinberg 2002's burst automaton, with the
    rate test made integer-exact by cross-multiplication:
    count * W * lift_den > lift_num * total, W = number of DISTINCT
    windows in the corpus). Runs shorter than ``min_windows`` are
    noise and dropped.

    Shape: the (window, word) histogram reuses trending_terms'
    partial + key_counts merge; W is a per-block distinct + driver
    union (windows are time-range/window_s — driver-bounded by
    construction); then ONE key-aligned exchange on word puts every
    word's windows in one block, where totals, the rate test and the
    gaps-and-islands run grouping (island = window_index - rank, the
    BPE-oracle idiom) are one vectorized polars pass. Output: (word,
    burst_start, burst_end, n_windows, burst_count, peak_count),
    sorted (word, burst_start)."""
    import numpy as np
    import polars as pl

    from textalyzer_ray.stages.groups import (
        grouped_apply,
        key_counts,
        partitions_for,
    )
    from textalyzer_ray.stages.tokenize import _flat_tokens

    win_us = int(window_s) * 1_000_000
    part_schema = pa.schema(
        [
            pa.field("window_start", pa.int64()),
            pa.field("word", pa.string()),
            pa.field("count", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        tokens, parents = _flat_tokens(t, text_col)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ws = (ts // win_us) * np.int64(window_s)
        tbl = pa.table(
            {
                "window_start": pa.array(ws, pa.int64()).take(parents),
                "word": tokens,
            }
        )
        return (
            pl.from_arrow(tbl)
            .group_by(["window_start", "word"])
            .len()
            .rename({"len": "count"})
            .with_columns(pl.col("count").cast(pl.Int64))
            .to_arrow()
            .cast(part_schema)
        )

    p = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    hist = key_counts(p, ["window_start", "word"], sum_cols=["count"]).map_batches(
        lambda t: pa.table(
            {
                "window_start": t["window_start"],
                "word": t["word"],
                "count": t["sum_count"],
            },
            schema=part_schema,
        ),
        batch_format="pyarrow",
    ).materialize()

    # W: distinct windows — per-block unique, driver union (bounded by
    # time-range / window_s, never corpus-sized)
    wins = hist.map_batches(
        lambda t: pa.table(
            {"w": pa.array(sorted(set(t["window_start"].to_pylist())), pa.int64())}
        ),
        batch_format="pyarrow",
    ).take_all()
    n_windows_total = len({r["w"] for r in wins})
    if n_windows_total == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.schema(
                [
                    pa.field("word", pa.string()),
                    pa.field("burst_start", pa.int64()),
                    pa.field("burst_end", pa.int64()),
                    pa.field("n_windows", pa.int64()),
                    pa.field("burst_count", pa.int64()),
                    pa.field("peak_count", pa.int64()),
                ]
            ).empty_table()
        )

    out_schema = pa.schema(
        [
            pa.field("word", pa.string()),
            pa.field("burst_start", pa.int64()),
            pa.field("burst_end", pa.int64()),
            pa.field("n_windows", pa.int64()),
            pa.field("burst_count", pa.int64()),
            pa.field("peak_count", pa.int64()),
        ]
    )

    def islands(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = (
            pl.from_arrow(t)
            .with_columns(
                pl.col("count").sum().over("word").alias("_total")
            )
            .filter(
                pl.col("count") * (n_windows_total * lift_den)
                > lift_num * pl.col("_total")
            )
            .sort(["word", "window_start"])
            .with_columns(
                (
                    pl.col("window_start") // window_s
                    - pl.col("word").cum_count().over("word").cast(pl.Int64)
                ).alias("_island")
            )
            .group_by(["word", "_island"])
            .agg(
                pl.col("window_start").min().alias("burst_start"),
                pl.col("window_start").max().alias("burst_end"),
                pl.len().cast(pl.Int64).alias("n_windows"),
                pl.col("count").sum().alias("burst_count"),
                pl.col("count").max().alias("peak_count"),
            )
            .filter(pl.col("n_windows") >= min_windows)
            .select(
                ["word", "burst_start", "burst_end", "n_windows",
                 "burst_count", "peak_count"]
            )
        )
        return df.to_arrow().cast(out_schema)

    return grouped_apply(
        hist,
        ["word"],
        islands,
        num_partitions=partitions_for(hist.count()),
    ).sort(["word", "burst_start"])


def vocab_coverage(
    ds: Dataset,
    vocab_size: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Top-``vocab_size`` vocabulary construction + per-document
    out-of-vocabulary rate — the tokenizer-budget audit an LM data
    pipeline runs before committing to a vocab (docs with high OOV
    under the deployment vocabulary are the ones the model will see
    as noise). Vocabulary = the first ``vocab_size`` words of the
    corpus histogram under the reference's total order (count desc,
    word asc — ties at the cutoff are deterministic).

    Scale shape: ONE word_histogram pass (auto-probed distributed
    merge) -> sort+limit to the vocab (vocab_size-bounded by
    definition, the only driver materialization) -> vocab broadcast
    via ray.put + the per-worker object cache -> ONE zero-shuffle
    per-doc scoring pass (each doc whole in its row). oov_frac =
    n_oov / n_tokens is one int/int double division (hash-safe raw;
    0.0 for token-free docs).

    -> (doc_id, n_tokens, n_oov, oov_frac) for every input doc,
    sorted by doc_id.

    Consumes ``ds`` twice (histogram + scoring) — pass a
    parquet-backed or materialized dataset (CLAUDE.md minhash_dedup
    lesson)."""
    import polars as pl
    import ray

    from textalyzer_ray.stages.groups import _worker_object_cache
    from textalyzer_ray.stages.tokenize import exploded_tokens

    vocab = [
        r["word"]
        for r in word_histogram(ds.select_columns([text_col]), sort=True)
        .limit(vocab_size)
        .take_all()
    ]
    vocab_ref = ray.put(frozenset(vocab))

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("n_tokens", pa.int64()),
            pa.field("n_oov", pa.int64()),
            pa.field("oov_frac", pa.float64()),
        ]
    )

    def score(t: pa.Table, _vref=vocab_ref) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        cache = _worker_object_cache()
        key = _vref.hex() if hasattr(_vref, "hex") else str(_vref)
        voc = cache.get(key)
        if voc is None:
            voc = cache[key] = ray.get(_vref)
        toks = pl.from_arrow(exploded_tokens(t, id_col, text_col))
        per = toks.group_by(id_col).agg(
            pl.len().cast(pl.Int64).alias("n_tokens"),
            (~pl.col("word").is_in(list(voc) or [""]))
            .sum()
            .cast(pl.Int64)
            .alias("n_oov"),
        )
        base = pl.from_arrow(t.select([id_col]))
        return (
            base.join(per, on=id_col, how="left", maintain_order="left")
            .with_columns(
                pl.col("n_tokens").fill_null(0),
                pl.col("n_oov").fill_null(0),
            )
            .with_columns(
                pl.when(pl.col("n_tokens") > 0)
                .then(
                    pl.col("n_oov").cast(pl.Float64)
                    / pl.col("n_tokens").cast(pl.Float64)
                )
                .otherwise(0.0)
                .alias("oov_frac")
            )
            .select([id_col, "n_tokens", "n_oov", "oov_frac"])
            .to_arrow()
            .cast(out_schema)
        )

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .sort(id_col)
    )
