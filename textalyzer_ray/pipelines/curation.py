"""Corpus curation pipelines (training-data extensions).

- ``cap_per_group``: per-key quota cap with a local head pre-prune
  (the "cap documents per domain" crawl rule; hot-domain skew bounded
  by construction).
- ``hash_sample``: deterministic bottom-k uniform sample.
- ``mixture_sample``: source-weighted subsampling, hash-independent of
  the split.
- ``dedup_against``: incremental exact dedup of a new crawl against an
  ingested reference corpus (hash-keyed, text-verified).
- ``token_shard_assignment``: fixed-token-budget shard packing via a
  distributed prefix-sum scan.
- ``dedup_lines_rebuild``: C4-style corpus-wide line dedup with
  document reassembly.
- ``curation_funnel``: quality gate -> line dedup -> split composed as
  one streaming pipeline.
- ``hash_split``: deterministic train/validation assignment from a
  multiplicative id hash — reproducible across runs, engines and
  partitionings (no RNG state), expressible in SQL for oracle parity.

Shuffle-free ops (hash_split, mixture_sample) are pure per-batch
arithmetic; the keyed ops ride stages.groups.grouped_apply with
data-sized partition counts (stages.groups.partitions_for).
"""

from __future__ import annotations

import logging

import pyarrow as pa
from ray.data import Dataset

logger = logging.getLogger(__name__)

# Knuth multiplicative hash constant (2654435761 = 2^32 / phi).
_KNUTH = 2654435761
_M32 = 1 << 32


def cap_per_group(
    ds: Dataset,
    key_col: str,
    n: int,
    order_col: str,
    num_partitions: int | None = None,
) -> Dataset:
    """Keep the ``n`` rows with the smallest ``order_col`` per ``key_col``.
    Deterministic output requires ``order_col`` unique within each key
    (e.g. a doc id); on (key, order) ties the cap still holds but WHICH
    tied row survives depends on shuffle arrival order. Returns the
    surviving rows with their original columns, sorted by
    (key_col, order_col).

    Scale: the shuffle moves each row once, keyed by ``key_col``; the
    per-block work is one vectorized polars sort + group head. A domain
    holding half the corpus still lands in one block — if a single
    group can exceed block memory, pre-prune inside ``map_batches``
    with the same head rule first (local head of n is a superset of the
    global head of n), then run this; the local pre-prune keeps at most
    n rows per key per input block.
    """
    import polars as pl

    from textalyzer_ray.stages.groups import grouped_apply

    def head_block(t: pa.Table) -> pa.Table:
        # cast back to the BLOCK's own schema (polars round-trips
        # string as large_string); no upfront ds.schema() — it is None
        # for empty/lazy datasets
        return (
            pl.from_arrow(t)
            .sort([key_col, order_col])
            .group_by(key_col, maintain_order=True)
            .head(n)
            .to_arrow()
            .cast(t.schema)
        )

    # per-input-block pre-prune: the global head-n per key survives any
    # local head-n prune, so the shuffle carries <= n rows per key per
    # input block instead of whole hot domains
    pruned = ds.map_batches(head_block, batch_format="pyarrow").materialize()
    if num_partitions is None:
        from textalyzer_ray.stages.groups import partitions_for

        num_partitions = partitions_for(pruned.count())
    return grouped_apply(
        pruned, [key_col], head_block, num_partitions=num_partitions
    ).sort([key_col, order_col])


def hash_sample(
    ds: Dataset,
    k: int,
    id_col: str = "doc_id",
) -> Dataset:
    """Deterministic uniform sample of ``k`` rows: the k smallest
    multiplicative-hash values of the id (a bottom-k sketch — the
    classic RNG-free uniform sample that is reproducible across runs
    and partitionings and mergeable across shards). Ties (hash
    collisions) break by id.

    Only blocks x k candidate rows leave the map stage (per-block
    bottom-k prune: the global bottom-k survives any local bottom-k),
    so the final sort touches a candidate set, not the corpus."""
    import numpy as np
    import polars as pl

    def local_bottomk(t: pa.Table) -> pa.Table:
        # per-block schema (no upfront ds.schema() — None when lazy/empty)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids & (_M32 - 1)) * _KNUTH) & (_M32 - 1)
        aug = t.append_column("_h", pa.array(h.astype(np.int64)))
        return (
            pl.from_arrow(aug)
            .sort(["_h", id_col])
            .head(k)
            .to_arrow()
            .cast(aug.schema)
        )

    cands = ds.map_batches(local_bottomk, batch_format="pyarrow")
    return (
        cands.sort(["_h", id_col])
        .limit(k)
        .drop_columns(["_h"])
    )


# xxhash64 prime2 — a DIFFERENT multiplier than hash_split's Knuth
# constant, so mixture keep/drop decisions are independent of the
# train/val assignment (sharing the hash would make every kept doc
# 'train')
_MIX_MULT = 2246822519


def mixture_sample(
    ds: Dataset,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
) -> Dataset:
    """Source-weighted subsampling to hit a target corpus mixture: keep
    a row iff hash(id) < floor(weight(source) * 2^32), with a per-source
    weight in [0, 1]. Deterministic, shuffle-free, reproducible under
    any partitioning, and INDEPENDENT of ``hash_split`` (different
    multiplier), so mixture and split compose without correlation.
    Expected kept fraction per source == its weight."""
    import polars as pl

    wt = pl.DataFrame(
        {
            source_col: list(weights),
            "_thr": [int(w * _M32) for w in weights.values()],
        }
    )
    default_thr = int(default_weight * _M32)

    def keep(t: pa.Table) -> pa.Table:
        import numpy as np

        if t.num_rows == 0:
            return t
        # maintain_order="left" is REQUIRED: the joined _thr column is
        # zipped positionally against ids from the pre-join table, and
        # polars does not otherwise guarantee left row order
        df = pl.from_arrow(t).join(
            wt, on=source_col, how="left", maintain_order="left"
        )
        thr = df["_thr"].fill_null(default_thr).to_numpy()
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids & (_M32 - 1)) * _MIX_MULT) & (_M32 - 1)
        return t.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def dedup_against(
    ds: Dataset,
    ref: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> Dataset:
    """Incremental exact dedup: keep the rows of ``ds`` whose text does
    NOT appear in the reference corpus ``ref`` (the "dedup the new crawl
    against what's already ingested" step). Returns the surviving
    (id, text) rows sorted by id.

    Scale shape: both sides are content-hashed (8-byte shuffle key) and
    key-aligned on the hash; the anti decision is an in-block polars
    anti-join on the ACTUAL text, so a 64-bit hash collision can never
    wrongly drop a row. Each side's text moves through the exchange
    exactly once — same partitioning pattern as
    ``exact_dedup_distributed``."""
    import polars as pl

    from textalyzer_ray.stages.dedup import add_content_hash
    from textalyzer_ray.stages.groups import grouped_apply

    from textalyzer_ray.stages.groups import id_type_of

    id_type = id_type_of(ds, id_col)
    out_schema = pa.schema(
        [pa.field(id_col, id_type), pa.field(text_col, pa.string())]
    )

    def tag(is_ref: bool):
        def fn(t: pa.Table) -> pa.Table:
            t = add_content_hash(t.select([id_col, text_col]), text_col)
            return t.append_column(
                "is_ref", pa.array([is_ref] * t.num_rows, pa.bool_())
            )

        return fn

    both = (
        ds.map_batches(tag(False), batch_format="pyarrow")
        .union(ref.map_batches(tag(True), batch_format="pyarrow"))
        .materialize()  # the hash shuffle buffers everything anyway
    )
    if num_partitions is None:
        from textalyzer_ray.stages.groups import partitions_for

        num_partitions = partitions_for(both.count())

    def anti_block(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        left = df.filter(~pl.col("is_ref"))
        right = df.filter(pl.col("is_ref")).select([text_col])
        out = left.join(right, on=text_col, how="anti").select(
            [id_col, text_col]
        )
        return out.to_arrow().cast(out_schema)

    return grouped_apply(
        both, ["content_hash"], anti_block, num_partitions=num_partitions
    ).sort(id_col)


def dedup_lines_rebuild(
    lines: Dataset,
    id_col: str = "doc_id",
    line_col: str = "line_number",
    content_col: str = "content",
    sep: str = " ",
    num_partitions: int | None = None,
) -> Dataset:
    """C4-style corpus-wide line deduplication with document
    reassembly: over an exploded (doc_id, line_number, content) line
    view, keep only the globally FIRST occurrence of each distinct
    line (min (doc_id, line_number)), then rebuild each document from
    its surviving lines in order. Documents that lose every line
    disappear. Returns (doc_id, text) sorted by doc_id.

    Scale shape: two key-aligned passes. Pass 1 partitions by a 64-bit
    content hash and keeps the first occurrence per ACTUAL content
    in-block (collision-proof); pass 2 partitions by doc id and joins
    the survivors in line order — each line crosses an exchange exactly
    twice, and no step sees more than one key's rows at once."""
    kept, num_partitions, id_type = dedup_lines_winners(
        lines, id_col, line_col, content_col, num_partitions
    )
    return rebuild_documents(
        kept, id_col, line_col, content_col, sep, num_partitions, id_type
    )


def dedup_lines_winners(
    lines: Dataset,
    id_col: str = "doc_id",
    line_col: str = "line_number",
    content_col: str = "content",
    num_partitions: int | None = None,
) -> tuple[Dataset, int, "pa.DataType"]:
    """Pass 1 of the C4 line dedup: the globally FIRST occurrence of
    each distinct line (min (doc_id, line_number) per actual content,
    collision-proof via the content-hash alignment). Returns (winners,
    num_partitions, id_type) so callers can reuse the sizing and id
    type for the rebuild exchange. Factored out so partition-addressed
    runs (pipelines/resumable.py resumable_funnel) can checkpoint the
    global stage's output and rebuild per doc-range partition."""
    import polars as pl

    from textalyzer_ray.stages.dedup import add_content_hash
    from textalyzer_ray.stages.groups import grouped_apply

    hashed = lines.map_batches(
        lambda t: add_content_hash(
            t.select([id_col, line_col, content_col]), content_col
        ),
        batch_format="pyarrow",
    ).materialize()  # the hash shuffle buffers everything anyway
    if num_partitions is None:
        from textalyzer_ray.stages.groups import partitions_for

        # one size for BOTH shuffles: each moves ~the same row volume
        # (lines, then surviving lines), and partition count bounds
        # rows-per-partition memory, not group count
        num_partitions = partitions_for(hashed.count())
    line_schema = pa.schema(
        [
            pa.field(id_col, _id_type_of(hashed, id_col)),
            pa.field(line_col, pa.int64()),
            pa.field(content_col, pa.string()),
        ]
    )

    def first_occurrence(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select([id_col, line_col, content_col]))
            .sort([id_col, line_col])
            .group_by(content_col, maintain_order=False)
            .first()
            .select([id_col, line_col, content_col])
            .to_arrow()
            .cast(line_schema)
        )

    kept = grouped_apply(
        hashed, ["content_hash"], first_occurrence,
        num_partitions=num_partitions,
    )
    return kept, num_partitions, line_schema.field(id_col).type


def _id_type_of(ds: Dataset, id_col: str):
    # schema() can still be None when the first materialized block is
    # empty (filter stages emit schema-less empty tables); fall back to
    # int64 ids — the repo-wide id type
    sch = ds.schema()
    return sch.base_schema.field(id_col).type if sch is not None else pa.int64()


def rebuild_documents(
    kept: Dataset,
    id_col: str = "doc_id",
    line_col: str = "line_number",
    content_col: str = "content",
    sep: str = " ",
    num_partitions: int | None = None,
    id_type: "pa.DataType | None" = None,
) -> Dataset:
    """Pass 2 of the C4 line dedup: reassemble each document from its
    surviving (id, line_number, content) rows in line order ->
    (id_col, text) sorted by id."""
    import polars as pl

    from textalyzer_ray.stages.groups import grouped_apply

    out_schema = pa.schema(
        [
            pa.field(
                id_col,
                id_type if id_type is not None else _id_type_of(kept, id_col),
            ),
            pa.field("text", pa.string()),
        ]
    )
    rebuild = rebuild_table_fn(id_col, line_col, content_col, sep, out_schema)

    if num_partitions is None:
        from textalyzer_ray.stages.groups import partitions_for

        kept = kept.materialize()
        num_partitions = partitions_for(kept.count())
    return grouped_apply(
        kept, [id_col], rebuild, num_partitions=num_partitions
    ).sort(id_col)


def rebuild_table_fn(
    id_col: str,
    line_col: str,
    content_col: str,
    sep: str,
    out_schema: pa.Schema,
):
    """The per-group document-reassembly kernel (sort by line, join
    with sep) as a reusable batch fn — callers that already co-locate a
    doc's lines in one block (e.g. resumable_funnel's doc-range
    partitions) apply it directly without a shuffle."""
    import polars as pl

    def rebuild(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select([id_col, line_col, content_col]))
            .sort([id_col, line_col])
            .group_by(id_col, maintain_order=True)
            .agg(pl.col(content_col).str.join(sep).alias("text"))
            .to_arrow()
            .cast(out_schema)
        )

    return rebuild


def remove_boilerplate_lines(
    lines: Dataset,
    max_df: int = 2,
    id_col: str = "doc_id",
    line_col: str = "line_number",
    content_col: str = "content",
    group_col: str | None = None,
    sep: str = " ",
    num_partitions: int | None = None,
) -> Dataset:
    """Frequency-based boilerplate removal (the CCNet/trafilatura
    sibling of C4 line dedup): over an exploded line view, drop EVERY
    occurrence of a line whose distinct-document frequency exceeds
    ``max_df`` (nav bars, cookie banners, footers — text repeated
    across many pages), then rebuild each document from its surviving
    lines in order. Unlike ``dedup_lines_rebuild`` (which keeps the
    first occurrence), a boilerplate line keeps NO occurrence.
    Documents that lose every line disappear.

    ``group_col`` scopes the frequency count (e.g. per source/host —
    the trafilatura deduplicate-per-site behavior); None counts
    corpus-wide.

    Scale shape: identical to ``dedup_lines_rebuild`` — pass 1 aligns
    on a 64-bit content hash, so every occurrence of a line sits in one
    block and the distinct-doc count + filter are in-block polars
    (collision-proof: grouped by ACTUAL content); pass 2 re-aligns by
    doc id for the ordered rebuild. Each line crosses an exchange
    exactly twice; no driver materialization."""
    import polars as pl

    from textalyzer_ray.stages.dedup import add_content_hash
    from textalyzer_ray.stages.groups import grouped_apply

    cols = [id_col, line_col, content_col] + ([group_col] if group_col else [])
    hashed = lines.map_batches(
        lambda t: add_content_hash(t.select(cols), content_col),
        batch_format="pyarrow",
    ).materialize()  # the hash shuffle buffers everything anyway
    if num_partitions is None:
        from textalyzer_ray.stages.groups import partitions_for

        num_partitions = partitions_for(hashed.count())
    sch = hashed.schema()
    id_type = (
        sch.base_schema.field(id_col).type if sch is not None else pa.int64()
    )
    line_schema = pa.schema(
        [
            pa.field(id_col, id_type),
            pa.field(line_col, pa.int64()),
            pa.field(content_col, pa.string()),
        ]
    )
    freq_keys = ([group_col] if group_col else []) + [content_col]

    def drop_frequent(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(cols))
        return (
            df.with_columns(
                pl.col(id_col).n_unique().over(freq_keys).alias("_df")
            )
            .filter(pl.col("_df") <= max_df)
            .select([id_col, line_col, content_col])
            .to_arrow()
            .cast(line_schema)
        )

    kept = grouped_apply(
        hashed, ["content_hash"], drop_frequent,
        num_partitions=num_partitions,
    )

    out_schema = pa.schema(
        [pa.field(id_col, id_type), pa.field("text", pa.string())]
    )

    def rebuild(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .sort([id_col, line_col])
            .group_by(id_col, maintain_order=True)
            .agg(pl.col(content_col).str.join(sep).alias("text"))
            .to_arrow()
            .cast(out_schema)
        )

    return grouped_apply(
        kept, [id_col], rebuild, num_partitions=num_partitions
    ).sort(id_col)


def token_shard_assignment(
    ds: Dataset,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Pack documents (in id order) into fixed-token-budget training
    shards: shard_id = floor(prefix_tokens / budget), where
    prefix_tokens is the total token count of all EARLIER docs — the
    deterministic greedy packing a dataloader can address directly.
    Returns (doc_id, n_tokens, shard_id) sorted by id.

    This is a distributed PREFIX-SUM SCAN (a primitive the Dataset API
    lacks), done in two passes over id-sorted blocks: pass 1 reduces one
    (block_min_id, block_total) pair per block to the driver; the driver
    computes exclusive block offsets (one int per block) and broadcasts
    them; pass 2 adds the block offset to a vectorized in-block cumsum.
    Only per-block scalars touch the driver, so the scan holds at any
    corpus size the sort holds at."""
    import numpy as np
    import ray

    from textalyzer_ray.pipelines.analytics import token_counts
    from textalyzer_ray.stages.groups import _worker_object_cache

    counts = (
        token_counts(ds.select_columns([id_col, text_col]))
        .sort(id_col)
        .materialize()
    )

    def block_total(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"min_id": pa.array([], pa.int64()),
                 "total": pa.array([], pa.int64())}
            )
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "min_id": pa.array([int(ids.min())], pa.int64()),
                "total": pa.array([int(n.sum())], pa.int64()),
            }
        )

    per_block = counts.map_batches(
        block_total, batch_format="pyarrow", batch_size=None
    ).take_all()
    per_block.sort(key=lambda r: r["min_id"])
    offsets: dict[int, int] = {}
    run = 0
    for r in per_block:
        offsets[r["min_id"]] = run
        run += r["total"]
    oref = ray.put(offsets)

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("n_tokens", pa.int64()),
            pa.field("shard_id", pa.int64()),
        ]
    )

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        cache = _worker_object_cache()
        key = oref.hex() if hasattr(oref, "hex") else str(oref)
        offs = cache.get(key)
        if offs is None:
            offs = cache[key] = ray.get(oref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        prev = offs[int(ids.min())] + np.cumsum(n) - n
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(n),
                "shard_id": pa.array(prev // budget),
            }
        ).cast(out_schema)

    return counts.map_batches(
        assign, batch_format="pyarrow", batch_size=None
    ).sort(id_col)


def _ngram_explode(n: int, id_col: str, text_col: str):
    """map_batches fn: (id, text) -> (id, gram) — one row per token
    n-gram occurrence (reference tokenization), vectorized via polars
    shifted-column concat (the bigram pattern generalized)."""
    import polars as pl

    from textalyzer_ray.stages.tokenize import exploded_tokens

    out_schema = pa.schema(
        [pa.field(id_col, pa.int64()), pa.field("gram", pa.string())]
    )

    def explode(t: pa.Table) -> pa.Table:
        pairs = exploded_tokens(t, id_col, text_col)
        if pairs.num_rows == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(pairs)
        cols = [pl.col("word")] + [
            pl.col("word").shift(-i).over(id_col) for i in range(1, n)
        ]
        df = (
            df.with_columns(
                pl.concat_str(cols, separator=" ", ignore_nulls=False)
                .alias("gram")
            )
            .drop_nulls("gram")
            .select([id_col, "gram"])
        )
        return df.to_arrow().cast(out_schema)

    return explode


def decontaminate(
    train: Dataset,
    eval_ds: Dataset,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_threshold: int = 20_000_000,
) -> Dataset:
    """Benchmark decontamination: drop every training document sharing
    at least one token ``n``-gram with the evaluation corpus (the
    GPT-3/PaLM-style overlap rule). Returns the CLEAN (id, text) rows
    sorted by id.

    Comparison is on the ACTUAL n-gram strings (no hashes), so the
    decision is bit-exact against the SQL oracle — a hash collision can
    never drop a clean document. Scale shape, picked from the MEASURED
    distinct eval-gram count (the connected_components small_threshold
    pattern):

    - <= ``broadcast_threshold`` grams (eval sets are small by nature —
      20M grams is ~1 GB of strings): collected once and broadcast
      (``ray.put`` + per-worker cache, the filter_to_keys pattern); each
      training batch explodes to n-grams and semi-joins locally — the
      only corpus-wide data movement is the contaminated id list.
    - above it (eval side too big to broadcast): a distributed
      ``left_semi`` hash join of the training grams against the
      eval-gram DATASET on ``gram`` — the eval grams never land on the
      driver; both sides hash-partition."""
    import pyarrow.compute as pc
    import ray

    from textalyzer_ray.stages.groups import (
        _worker_object_cache,
        filter_to_keys,
        key_counts,
    )

    explode = _ngram_explode(n, id_col, text_col)
    eval_gram_ds = (
        key_counts(
            eval_ds.select_columns([id_col, text_col]).map_batches(
                explode, batch_format="pyarrow"
            ),
            ["gram"],
        )
        .select_columns(["gram"])
        .materialize()
    )
    n_grams = eval_gram_ds.count()

    train_grams = train.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    )
    if n_grams > broadcast_threshold:
        from textalyzer_ray.pipelines.joins import bucketed_join
        from textalyzer_ray.stages.groups import partitions_for

        logger.info(
            "decontaminate: %d eval grams > broadcast_threshold=%d — "
            "distributed semi join", n_grams, broadcast_threshold,
        )

        def to_large_gram(t: pa.Table) -> pa.Table:
            # acero rejects string-vs-large_string join keys; polars
            # stages emit large_string, so normalize both sides to it
            i = t.schema.get_field_index("gram")
            return t.set_column(i, "gram", t["gram"].cast(pa.large_string()))

        matched = bucketed_join(
            train_grams.map_batches(to_large_gram, batch_format="pyarrow"),
            eval_gram_ds.map_batches(to_large_gram, batch_format="pyarrow"),
            "gram",
            num_partitions=partitions_for(n_grams, rows_per_part=5_000_000),
            how="left_semi",
        )
    else:
        gram_parts = [
            b
            for b in eval_gram_ds.iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
            if b.num_rows
        ]
        gram_table = (
            pa.concat_tables(gram_parts)
            if gram_parts
            else pa.schema([pa.field("gram", pa.string())]).empty_table()
        )
        gref = ray.put(gram_table)
        matched = filter_to_keys(train_grams, ["gram"], gref)
    contaminated = (
        key_counts(matched, [id_col]).select_columns([id_col]).take_all()
    )
    from textalyzer_ray.stages.groups import id_type_of

    bad_ids = pa.table(
        {
            id_col: pa.array(
                [r[id_col] for r in contaminated], id_type_of(train, id_col)
            )
        }
    )
    bref = ray.put(bad_ids)

    def drop_bad(t: pa.Table) -> pa.Table:
        cache = _worker_object_cache()
        key = bref.hex() if hasattr(bref, "hex") else str(bref)
        bad = cache.get(key)
        if bad is None:
            bad = cache[key] = ray.get(bref)[id_col]
        mask = pc.invert(
            pc.is_in(t[id_col], value_set=bad.combine_chunks().cast(t[id_col].type))
        )
        return t.filter(mask)

    return (
        train.select_columns([id_col, text_col])
        .map_batches(drop_bad, batch_format="pyarrow")
        .sort(id_col)
    )


def rep_signals(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> Dataset:
    """Gopher-style repetition-removal signals per document (Rae et al.
    2021, table A1 "repetitious text" family) — the within-doc
    counterpart of the corpus-wide dedup pipelines. All counts are
    integers so a DuckDB oracle verifies every column exactly:

    - ``n_lines`` / ``dup_line_count`` / ``dup_line_chars``: duplicate
      lines (Rust ``lines()`` semantics via stages.lines.explode_lines);
      dup_* count occurrences beyond each content's first.
    - ``n_tokens`` / ``top_bigram`` / ``top_bigram_count``: the most
      frequent token 2-gram (exact tokenizer; ties break
      bigram-ascending, same total order as doc_top_bigram).
    - ``dup5_excess``: occurrences beyond the first of repeated token
      5-grams. Occurrence-count form of Gopher's duplicate-n-gram
      signal — the char-marking variant needs per-doc interval union,
      deliberately not implemented (documented deviation).
    - ``kept``: all three rules pass, thresholds 0.30 / 0.20 / 0.15 in
      EXACT integer arithmetic (10*dup_lines <= 3*n_lines;
      5*count*len(top_bigram) <= n_chars;
      20*dup5_excess <= 3*max(n_tokens-4, 0)).

    Doc-local by construction: one vectorized polars pass per batch, no
    shuffle, embarrassingly parallel at any corpus size.
    """
    import polars as pl

    from textalyzer_ray.stages.lines import explode_lines
    from textalyzer_ray.stages.tokenize import exploded_tokens

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("n_lines", pa.int64()),
            pa.field("n_chars", pa.int64()),
            pa.field("n_tokens", pa.int64()),
            pa.field("dup_line_count", pa.int64()),
            pa.field("dup_line_chars", pa.int64()),
            pa.field("top_bigram", pa.string()),
            pa.field("top_bigram_count", pa.int64()),
            pa.field("dup5_excess", pa.int64()),
            pa.field("kept", pa.int64()),
        ]
    )

    def per_doc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        base = (
            pl.from_arrow(t.select([id_col, text_col]))
            .with_columns(
                pl.col(text_col).str.len_chars().cast(pl.Int64).alias("n_chars")
            )
            .select(id_col, "n_chars")
        )
        # duplicate-line signals: (c-1) per content group is 0 for
        # unique lines, so plain sums need no c>1 filter
        lg = (
            pl.from_arrow(explode_lines(t, id_col, text_col))
            .group_by([id_col, "content"])
            .len()
            .rename({"len": "c"})
        )
        lsig = lg.group_by(id_col).agg(
            pl.col("c").sum().cast(pl.Int64).alias("n_lines"),
            (pl.col("c") - 1).sum().cast(pl.Int64).alias("dup_line_count"),
            ((pl.col("c") - 1) * pl.col("content").str.len_chars())
            .sum()
            .cast(pl.Int64)
            .alias("dup_line_chars"),
        )
        toks = pl.from_arrow(exploded_tokens(t, id_col, text_col))
        ntok = toks.group_by(id_col).len().rename({"len": "n_tokens"})
        grams = toks
        for k in range(1, 5):
            grams = grams.with_columns(
                pl.col("word").shift(-k).over(id_col).alias(f"_w{k}")
            )
        bg = (
            grams.drop_nulls("_w1")
            .with_columns((pl.col("word") + " " + pl.col("_w1")).alias("g"))
            .group_by([id_col, "g"])
            .len()
            .rename({"len": "c"})
        )
        btop = (
            bg.sort([id_col, "c", "g"], descending=[False, True, False])
            .group_by(id_col, maintain_order=True)
            .head(1)
            .select(
                id_col,
                pl.col("g").alias("top_bigram"),
                pl.col("c").cast(pl.Int64).alias("top_bigram_count"),
            )
        )
        d5 = (
            grams.drop_nulls(["_w1", "_w2", "_w3", "_w4"])
            .with_columns(
                (
                    pl.col("word") + " " + pl.col("_w1") + " " + pl.col("_w2")
                    + " " + pl.col("_w3") + " " + pl.col("_w4")
                ).alias("g")
            )
            .group_by([id_col, "g"])
            .len()
            .rename({"len": "c"})
            .group_by(id_col)
            .agg((pl.col("c") - 1).sum().cast(pl.Int64).alias("dup5_excess"))
        )
        out = (
            base.join(lsig, on=id_col, how="left")
            .join(ntok, on=id_col, how="left")
            .join(btop, on=id_col, how="left")
            .join(d5, on=id_col, how="left")
            .with_columns(
                pl.col("n_lines", "dup_line_count", "dup_line_chars",
                       "dup5_excess").fill_null(0),
                pl.col("n_tokens").fill_null(0).cast(pl.Int64),
                pl.col("top_bigram").fill_null(""),
                pl.col("top_bigram_count").fill_null(0),
            )
            .with_columns(
                (
                    (10 * pl.col("dup_line_count") <= 3 * pl.col("n_lines"))
                    & (
                        5
                        * pl.col("top_bigram_count")
                        * pl.col("top_bigram").str.len_chars().cast(pl.Int64)
                        <= pl.col("n_chars")
                    )
                    & (
                        20 * pl.col("dup5_excess")
                        <= 3 * (pl.col("n_tokens") - 4).clip(lower_bound=0)
                    )
                )
                .cast(pl.Int64)
                .alias("kept")
            )
        )
        return out.select(out_schema.names).to_arrow().cast(out_schema)

    return ds.map_batches(per_doc, batch_format="pyarrow", zero_copy_batch=True)


# RE2-only redaction patterns (no lookahead/backrefs) shared verbatim
# with the SQL oracle: Arrow's replace_substring_regex and DuckDB's
# regexp_replace(..., 'g') both run RE2, so redactions are bit-equal.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9][0-9()\-\. ]{6,}[0-9]"


def scrub_pii(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Redact emails and phone-shaped digit runs to <EMAIL> / <PHONE>
    placeholders — the standard pre-training PII scrub pass. One
    vectorized RE2 substitution chain per batch, no shuffle; also
    returns per-doc redaction counts (n_emails, n_phones BIGINT) so a
    pipeline can audit scrub volume without a second pass."""
    import pyarrow.compute as pc

    def scrub(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        n_e = pc.count_substring_regex(txt, PII_EMAIL_RE)
        step1 = pc.replace_substring_regex(txt, PII_EMAIL_RE, "<EMAIL>")
        n_p = pc.count_substring_regex(step1, PII_PHONE_RE)
        out = pc.replace_substring_regex(step1, PII_PHONE_RE, "<PHONE>")
        return pa.table(
            {
                id_col: t[id_col],
                text_col: out,
                "n_emails": pc.cast(n_e, pa.int64()),
                "n_phones": pc.cast(n_p, pa.int64()),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow").sort(id_col)


def curation_funnel(
    ds: Dataset,
    explode_fn,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_fraction: float = 0.875,
    rules: list[str] | None = None,
) -> Dataset:
    """End-to-end training-data curation funnel composed from the
    individual operators, all streaming: Gopher quality filter (keep
    only documents passing every rule) -> corpus-wide C4 line dedup
    with document reassembly (among the survivors) -> deterministic
    hash train/val split. ``explode_fn`` maps a (id, text) batch to the
    (id, line_number, content) line view (corpus-specific line
    semantics stay with the caller). Returns (doc_id, text, split)
    sorted by id.

    ``rules`` selects which Gopher rule columns gate a document
    (default: the full set via the precomputed ``kept``); practitioners
    tune rule subsets per corpus, and a corpus-inappropriate rule (e.g.
    the English-stopword rule on a synthetic vocabulary) would
    otherwise empty the funnel.

    Each stage is the already-verified operator — the funnel adds no
    new semantics, it demonstrates they compose without materializing
    between stages (the only pipeline breaks are the two key-aligned
    shuffles inside the line dedup)."""
    kept = curation_gate(ds, rules, id_col, text_col)
    lines = kept.map_batches(explode_fn, batch_format="pyarrow")
    rebuilt = dedup_lines_rebuild(lines, id_col=id_col)
    return hash_split(rebuilt, id_col, train_fraction).sort(id_col)


def curation_gate(
    ds: Dataset,
    rules: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """The funnel's Gopher quality gate as a standalone stage: score
    every document, keep those passing every selected rule column,
    return the surviving (id_col, text_col) rows. Factored out so the
    partition-addressed funnel (pipelines/resumable.py) runs the same
    gate byte-for-byte."""
    import functools

    import pyarrow.compute as pc

    from textalyzer_ray.stages.analyze import GopherFilter
    from textalyzer_ray.stages.pools import default_pool

    scored = ds.select_columns([id_col, text_col]).map_batches(
        GopherFilter, batch_format="pyarrow", concurrency=default_pool()
    )
    gate_cols = rules if rules else ["kept"]

    def keep_filter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([id_col, text_col]) if t.num_columns else t
        mask = functools.reduce(
            pc.and_, [pc.equal(t[c], 1) for c in gate_cols]
        )
        return t.filter(mask).select([id_col, text_col])

    return scored.map_batches(keep_filter, batch_format="pyarrow")


def hash_split(
    ds: Dataset,
    id_col: str,
    train_fraction: float = 0.875,
    split_col: str = "split",
) -> Dataset:
    """Append ``split_col`` ('train' | 'val') from a Knuth
    multiplicative hash of ``id_col``: h = (id mod 2^32) * 2654435761
    mod 2^32; train iff h < floor(train_fraction * 2^32). Deterministic,
    shuffle-free, identical under any partitioning — the property that
    makes a 100 TB split resumable and re-derivable. ``train_fraction``
    is quantized to 1/2^32 steps by TRUNCATION — the SQL oracles use
    floor() for the same threshold, because CAST-to-integer would round
    to nearest and disagree for fractions whose value*2^32 has
    fractional part >= 0.5."""
    import pyarrow.compute as pc

    threshold = int(train_fraction * _M32)

    def assign(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.uint64())
        h = pc.multiply_checked(
            pc.bit_wise_and(ids, _M32 - 1), pa.scalar(_KNUTH, pa.uint64())
        )
        h = pc.bit_wise_and(h, _M32 - 1)
        split = pc.if_else(
            pc.less(h, pa.scalar(threshold, pa.uint64())),
            pa.scalar("train"),
            pa.scalar("val"),
        )
        return t.append_column(split_col, split)

    return ds.map_batches(assign, batch_format="pyarrow")


def weighted_sample(
    ds: Dataset,
    k: int = 64,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
) -> Dataset:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis 2006, Algorithm A): each row gets key = u^(1/w) with u a
    uniform derived from ``hll_hash64(str(id))`` and w = ``weight_col``
    (> 0; non-positive weights are excluded, matching the ES
    precondition); the k largest keys are the sample. Inclusion
    probability proportional to weight at every prefix — the
    importance-weighted corpus subsample (quality- or length-weighted)
    a mixture pipeline draws, reproducible across runs and cluster
    shapes because the "randomness" is the hash chain.

    Rank is compared via ln(u)/w (monotone with u^(1/w); avoids pow).
    Cross-engine float story: u = (CAST(h AS DOUBLE)+0.5)/2^64 and the
    division are IEEE-identical in numpy and DuckDB; ln() may differ by
    ulps, so adjacent-gap margins among the candidates are MEASURED and
    pytest-pinned (>= 1e-9 relative at every sf vs ~1e-16 ln error).

    Shape: one streaming pass with a PER-BLOCK top-k prune (the
    bm25_topk pattern) bounds the exchange at blocks x k rows; the
    final merge ranks a driver-sized candidate table. No corpus sort,
    no RNG state."""
    import numpy as np

    from textalyzer_ray.core.fingerprint import hll_hash64_array

    if k <= 0:
        raise ValueError("k must be positive")
    cand_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("es_key", pa.float64()),
        ]
    )

    def block_topk(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = w > 0
        h = hll_hash64_array(
            pc.cast(t[id_col], pa.string()).to_pylist()
        ).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.log((h + 0.5) / 18446744073709551616.0) / w
        key, ids = key[pos], ids[pos]
        if len(ids) > k:
            # stable top-k under the (key desc, id asc) total order
            order = np.lexsort((ids, -key))[:k]
            key, ids = key[order], ids[order]
        return pa.table(
            {id_col: pa.array(ids), "es_key": pa.array(key)},
            schema=cand_schema,
        )

    candidates = ds.select_columns([id_col, weight_col]).map_batches(
        block_topk, batch_format="pyarrow"
    )
    # driver-sized by construction: blocks x k candidate rows
    rows = candidates.take_all()
    rows.sort(key=lambda r: (-r["es_key"], r[id_col]))
    top = rows[:k]
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "rank": pa.array(
                    list(range(1, len(top) + 1)), pa.int64()
                ),
                id_col: pa.array([r[id_col] for r in top], pa.int64()),
            }
        )
    )


def stratified_split(
    ds: Dataset,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    train_num: int = 4,
    train_den: int = 5,
    split_col: str = "is_train",
) -> Dataset:
    """EXACT-count stratified train/holdout split: within every
    stratum, exactly ``floor(n_stratum * train_num / train_den)`` rows
    get ``split_col = 1``, chosen as the lowest rows under the total
    order (hll_hash64(str(id)), id) — deterministic, RNG-free, and
    partitioning-invariant, the property ``hash_split`` has, but with
    per-stratum fractions that hold EXACTLY instead of in expectation
    (a 10^4-doc low-resource stratum keeps precisely its share; a
    Bernoulli threshold can miss by hundreds).

    Distributed rank selection (no per-stratum sort of the corpus):

    1. one streaming pass -> (stratum, h>>48) histogram via
       ``key_counts`` — the exchange is bounded by strata x 2^16 rows,
       never by corpus rows; the driver picks each stratum's boundary
       bucket and the residual rank inside it;
    2. a second pass histograms ONLY boundary-bucket rows on the next
       16 hash bits (expected n/2^16 of the corpus feeds it, and the
       exchange is again strata x 2^16);
    3. the surviving (stratum, 32-bit-prefix) slivers — expected
       n/2^32 rows, ~250 rows even at 10^12 — are collected and ranked
       exactly on the driver, yielding one (cut_hash, cut_id) pair per
       stratum;
    4. the strata-sized cut table rides the closure into a stateless
       vectorized scoring pass: train iff (h, id) <= (cut_hash,
       cut_id).

    The fraction is a RATIONAL (train_num/train_den) so the threshold
    ``(n * num) // den`` is integer-exact on both engines (float
    floor(frac*n) disagrees near exact multiples — the setjoin prefix
    lesson). Oracle: row_number() OVER (PARTITION BY stratum ORDER BY
    hv, id) <= (n*num)//den via the SQL-recomputable hll_hash64 chain."""
    import numpy as np

    from textalyzer_ray.core.fingerprint import hll_hash64_array
    from textalyzer_ray.stages.groups import key_counts

    if not (0 < train_num <= train_den):
        raise ValueError("train_num/train_den must be a fraction in (0, 1]")

    def _hashes(t: pa.Table) -> "tuple[np.ndarray, np.ndarray]":
        import pyarrow.compute as pc

        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = hll_hash64_array(pc.cast(t[id_col], pa.string()).to_pylist())
        return h, ids

    def _strata(t: pa.Table) -> np.ndarray:
        return np.asarray(t[strata_col].to_pylist(), dtype=object)

    narrow = ds.select_columns([id_col, strata_col])
    part_schema = pa.schema(
        [
            pa.field("s", pa.string()),
            pa.field("b", pa.int64()),
            pa.field("n", pa.int64()),
        ]
    )

    def l1_partial(t: pa.Table) -> pa.Table:
        h, _ = _hashes(t)
        b = (h >> np.uint64(48)).astype(np.int64)
        return (
            pa.table({"s": t[strata_col], "b": pa.array(b)})
            .group_by(["s", "b"])
            .aggregate([("b", "count")])
            .rename_columns(["s", "b", "n"])
            .cast(part_schema)
        )

    hist1 = key_counts(
        narrow.map_batches(l1_partial, batch_format="pyarrow"),
        ["s", "b"],
        sum_cols=["n"],
    ).take_all()

    # driver: per-stratum boundary bucket + residual rank (tiny: the
    # histogram is bounded by strata x 2^16 regardless of corpus size)
    per: dict[str, list[tuple[int, int]]] = {}
    for r in hist1:
        per.setdefault(r["s"], []).append((r["b"], r["sum_n"]))

    def _boundary(buckets: list[tuple[int, int]], target: int):
        """-> (boundary_bucket | None, residual_rank): the bucket
        holding the target-th smallest element and the rank within it;
        None when target <= 0 (no row selected). target == total lands
        on the last non-empty bucket with a full residual — the generic
        cut path then picks the bucket's max, so frac == 1 needs no
        special case."""
        if target <= 0:
            return None, 0
        cum = 0
        for b, n in sorted(buckets):
            if cum + n >= target:
                return b, target - cum
            cum += n
        raise AssertionError("target exceeds stratum size")

    stage1: dict[str, tuple[object, int]] = {}
    for s, buckets in per.items():
        n_s = sum(n for _, n in buckets)
        stage1[s] = _boundary(buckets, (n_s * train_num) // train_den)

    bnd1 = {s: v[0] for s, v in stage1.items() if v[0] is not None}

    def _boundary_mask(t: pa.Table, bmap: dict, shift: int, h: np.ndarray):
        strat = _strata(t)
        b = (h >> np.uint64(shift)).astype(np.int64)
        m = np.zeros(len(strat), dtype=bool)
        for s, bb in bmap.items():
            m |= (strat == s) & (b == bb)
        return m

    cuts: dict[str, tuple[int, int]] = {}
    if bnd1:
        def l2_partial(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            h, _ = _hashes(t)
            m = _boundary_mask(t, bnd1, 48, h)
            b2 = ((h[m] >> np.uint64(32)) & np.uint64(0xFFFF)).astype(
                np.int64
            )
            return (
                pa.table(
                    {"s": pc.filter(t[strata_col], pa.array(m)), "b": b2}
                )
                .group_by(["s", "b"])
                .aggregate([("b", "count")])
                .rename_columns(["s", "b", "n"])
                .cast(part_schema)
            )

        hist2 = key_counts(
            narrow.map_batches(l2_partial, batch_format="pyarrow"),
            ["s", "b"],
            sum_cols=["n"],
        ).take_all()
        per2: dict[str, list[tuple[int, int]]] = {}
        for r in hist2:
            per2.setdefault(r["s"], []).append((r["b"], r["sum_n"]))
        bnd2: dict[str, int] = {}
        resid2: dict[str, int] = {}
        for s, (b1, resid) in {
            s: v for s, v in stage1.items() if s in bnd1
        }.items():
            bb, rr = _boundary(per2[s], resid)
            assert bb is not None  # 0 < resid <= bucket size
            bnd2[s] = (bnd1[s] << 16) | bb
            resid2[s] = rr

        def tail_rows(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            h, ids = _hashes(t)
            m = _boundary_mask(t, bnd2, 32, h)
            return pa.table(
                {
                    "s": pc.filter(t[strata_col], pa.array(m)),
                    "h": pa.array(h[m], pa.uint64()),
                    "id": pa.array(ids[m], pa.int64()),
                }
            ).cast(
                pa.schema(
                    [
                        pa.field("s", pa.string()),
                        pa.field("h", pa.uint64()),
                        pa.field("id", pa.int64()),
                    ]
                )
            )

        tail: dict[str, list[tuple[int, int]]] = {}
        for r in narrow.map_batches(
            tail_rows, batch_format="pyarrow"
        ).take_all():
            tail.setdefault(r["s"], []).append((r["h"], r["id"]))
        for s, rows in tail.items():
            rows.sort()
            cut_h, cut_id = rows[resid2[s] - 1]
            cuts[s] = (int(cut_h), int(cut_id))

    out_field = pa.field(split_col, pa.int64())

    def score(t: pa.Table) -> pa.Table:
        h, ids = _hashes(t)
        strat = _strata(t)
        train = np.zeros(len(ids), dtype=bool)
        for s, (ch, cid) in cuts.items():
            m = strat == s
            train[m] = (h[m] < np.uint64(ch)) | (
                (h[m] == np.uint64(ch)) & (ids[m] <= cid)
            )
        return t.append_column(
            out_field, pa.array(train.astype(np.int64), pa.int64())
        )

    return ds.map_batches(score, batch_format="pyarrow")


def dup_ngram_coverage(
    ds: Dataset,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_threshold: int = 20_000_000,
) -> Dataset:
    """Cross-document duplicated n-gram coverage (the corpus-level
    counterpart of ``rep_signals``): for each document, how much of it
    consists of token ``n``-grams that also appear in at least one
    OTHER document — the RefinedWeb ``dup_ngram_frac`` / Dolma
    duplicate-span signal family (Penedo et al. 2023 §3.3; reference
    duplication semantics: duplication.rs — here lifted from lines to
    token n-grams and from one doc to the corpus). All columns BIGINT,
    so a DuckDB oracle verifies every value exactly:

    - ``n_grams`` / ``n_distinct``: the doc's n-gram occurrences and
      distinct n-grams (0 for docs shorter than ``n`` tokens).
    - ``dup_grams`` / ``dup_distinct``: the occurrences / distinct
      grams whose gram occurs in >= 2 distinct documents.
    - ``kept``: exact integer rule 10*dup_grams <= 7*n_grams
      (coverage <= 0.70; empty docs trivially kept).

    Scale shape, picked from the MEASURED corpus-duplicated gram count
    (the ``decontaminate`` auto-switch pattern):

    - First pass: per-batch distinct (doc, gram) pairs (each doc is one
      row, so batch-local dedup is globally exact) -> gram doc-frequency
      via ``key_counts`` (skew-free polars partials + merge; a hot
      boilerplate gram never lands whole in one block here) -> the
      duplicated-gram set, materialized (it is the small duplicated
      fraction by construction).
    - ``n_dup <= broadcast_threshold`` (~1 GB of grams): the set is
      broadcast (``ray.put`` + per-worker cache) and a second streaming
      pass over ``ds`` computes every per-doc column batch-locally —
      zero further shuffle, nothing corpus-sized materialized.
    - above it: distinct pairs (+ a per-doc ``""`` sentinel row — ""
      can never be a real gram — carrying zero-gram docs through the
      doc-keyed merges) are materialized once and consumed twice:
      gram-aligned ``grouped_apply`` re-derives duplicated pairs
      (df >= 2 within the gram's block; NOTE a gram shared by k docs
      puts k rows in one block — salt by a doc-hash prefix and add a
      merge level if a boilerplate gram ever dominates), then two
      doc-keyed ``key_counts`` (dup + totals) union-tag into the final
      doc-aligned merge. One corpus-scale materialization is the price
      of single-pass input consumption in this regime.

    Consumes ``ds`` twice on the broadcast path — pass a parquet-backed
    or materialized dataset (CLAUDE.md minhash_dedup lesson).
    """
    import pyarrow.compute as pc
    import ray

    from textalyzer_ray.stages.groups import (
        _worker_object_cache,
        grouped_apply,
        key_counts,
        partitions_for,
    )

    import polars as pl

    explode = _ngram_explode(n, id_col, text_col)
    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("n_grams", pa.int64()),
            pa.field("n_distinct", pa.int64()),
            pa.field("dup_grams", pa.int64()),
            pa.field("dup_distinct", pa.int64()),
            pa.field("kept", pa.int64()),
        ]
    )
    pairs_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("gram", pa.string()),
            pa.field("occ", pa.int64()),
            pa.field("d", pa.int64()),
        ]
    )

    def distinct_pairs(t: pa.Table) -> pa.Table:
        # one row per distinct (doc, gram) with its occurrence count,
        # plus a sentinel row per doc (gram="", occ=0, d=0) so zero-gram
        # docs survive the doc-keyed merges
        per = (
            pl.from_arrow(explode(t))
            .group_by([id_col, "gram"])
            .len()
            .rename({"len": "occ"})
            .with_columns(
                pl.col("occ").cast(pl.Int64),
                pl.lit(1, dtype=pl.Int64).alias("d"),
            )
        )
        base = (
            pl.from_arrow(t.select([id_col]))
            .cast({id_col: pl.Int64})
            .with_columns(
                pl.lit("").alias("gram"),
                pl.lit(0, dtype=pl.Int64).alias("occ"),
                pl.lit(0, dtype=pl.Int64).alias("d"),
            )
        )
        cols = [id_col, "gram", "occ", "d"]
        return pl.concat([per.select(cols), base.select(cols)]).to_arrow().cast(
            pairs_schema
        )

    def finish(df: "pl.DataFrame") -> pa.Table:
        return (
            df.with_columns(
                (10 * pl.col("dup_grams") <= 7 * pl.col("n_grams"))
                .cast(pl.Int64)
                .alias("kept")
            )
            .select(out_schema.names)
            .to_arrow()
            .cast(out_schema)
        )

    def real_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["d"], 1))

    # pass 1: gram doc-frequency -> duplicated-gram set + measured size
    dup_set = (
        key_counts(
            ds.map_batches(distinct_pairs, batch_format="pyarrow").map_batches(
                real_only, batch_format="pyarrow"
            ),
            ["gram"],
        )
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["count"], 2)).select(["gram"]),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_dup = dup_set.count()

    if n_dup <= broadcast_threshold:
        dup_tbl = pa.concat_tables(
            list(dup_set.iter_batches(batch_size=None, batch_format="pyarrow"))
        ) if n_dup else pa.schema([pa.field("gram", pa.string())]).empty_table()
        dup_ref = ray.put(dup_tbl)

        def coverage(t: pa.Table) -> pa.Table:
            cache = _worker_object_cache()
            ck = dup_ref.hex() if hasattr(dup_ref, "hex") else str(dup_ref)
            dupdf = cache.get(ck)
            if dupdf is None:
                dupdf = cache[ck] = (
                    pl.from_arrow(ray.get(dup_ref)).select("gram").unique()
                )
            df = pl.from_arrow(distinct_pairs(t))
            tot = df.group_by(id_col).agg(
                pl.col("occ").sum().cast(pl.Int64).alias("n_grams"),
                pl.col("d").sum().cast(pl.Int64).alias("n_distinct"),
            )
            dup = (
                df.filter(pl.col("d") == 1)
                .join(dupdf, on="gram", how="semi")
                .group_by(id_col)
                .agg(
                    pl.col("occ").sum().cast(pl.Int64).alias("dup_grams"),
                    pl.len().cast(pl.Int64).alias("dup_distinct"),
                )
            )
            return finish(
                tot.join(dup, on=id_col, how="left").fill_null(0)
            )

        return ds.map_batches(coverage, batch_format="pyarrow")

    logger.info(
        "dup_ngram_coverage: %d dup grams > broadcast_threshold=%d — "
        "distributed gram-aligned path", n_dup, broadcast_threshold,
    )
    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow").materialize()
    n_pairs = pairs.count()
    npart = partitions_for(n_pairs, rows_per_part=5_000_000)

    def keep_dup(t: pa.Table) -> pa.Table:
        # rows are distinct (doc, gram): block-local df == corpus df
        return (
            pl.from_arrow(t)
            .filter(pl.len().over("gram") >= 2)
            .to_arrow()
            .cast(pairs_schema)
        )

    dup_pairs = grouped_apply(
        pairs.map_batches(real_only, batch_format="pyarrow"),
        ["gram"],
        keep_dup,
        num_partitions=npart,
    )
    dup_doc = key_counts(
        dup_pairs, [id_col], sum_cols=["occ", "d"], distributed=True
    )
    tot_doc = key_counts(
        pairs, [id_col], sum_cols=["occ", "d"], distributed=True
    )

    def tag(n_grams_side: bool):
        def fn(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t)
            zero = pl.lit(0, dtype=pl.Int64)
            if n_grams_side:
                df = df.with_columns(
                    pl.col("sum_occ").alias("n_grams"),
                    pl.col("sum_d").alias("n_distinct"),
                    zero.alias("dup_grams"),
                    zero.alias("dup_distinct"),
                )
            else:
                df = df.with_columns(
                    zero.alias("n_grams"),
                    zero.alias("n_distinct"),
                    pl.col("sum_occ").alias("dup_grams"),
                    pl.col("sum_d").alias("dup_distinct"),
                )
            cols = [id_col, "n_grams", "n_distinct", "dup_grams", "dup_distinct"]
            return df.select(cols).to_arrow().cast(
                pa.schema([pa.field(c, pa.int64()) for c in cols])
            )

        return fn

    tagged = tot_doc.map_batches(tag(True), batch_format="pyarrow").union(
        dup_doc.map_batches(tag(False), batch_format="pyarrow")
    )

    def merge_doc(t: pa.Table) -> pa.Table:
        return finish(
            pl.from_arrow(t)
            .group_by(id_col)
            .agg(
                pl.col(c).sum().cast(pl.Int64).alias(c)
                for c in ["n_grams", "n_distinct", "dup_grams", "dup_distinct"]
            )
        )

    return grouped_apply(tagged, [id_col], merge_doc, num_partitions=npart)


def _ngram_starts_explode(n: int, id_col: str, text_col: str):
    """map_batches fn: (id, text) -> (id, i, gram) — one row per token
    n-gram occurrence WITH its 1-based start position among the doc's
    (non-empty, reference-tokenized) tokens. ``_ngram_explode`` plus
    the position column the span-removal rebuild needs."""
    import polars as pl

    from textalyzer_ray.stages.tokenize import exploded_tokens

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("i", pa.int64()),
            pa.field("gram", pa.string()),
        ]
    )

    def explode(t: pa.Table) -> pa.Table:
        pairs = exploded_tokens(t, id_col, text_col)
        if pairs.num_rows == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(pairs).with_columns(
            pl.col(id_col).cast(pl.Int64),
            pl.col("word").cum_count().over(id_col).cast(pl.Int64).alias("i"),
        )
        cols = [pl.col("word")] + [
            pl.col("word").shift(-j).over(id_col) for j in range(1, n)
        ]
        df = (
            df.with_columns(
                pl.concat_str(cols, separator=" ", ignore_nulls=False)
                .alias("gram")
            )
            .drop_nulls("gram")
            .select([id_col, "i", "gram"])
        )
        return df.to_arrow().cast(out_schema)

    return explode


def dup_span_removal(
    ds: Dataset,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_threshold: int = 20_000_000,
) -> Dataset:
    """Cross-document duplicated-span REMOVAL (the action to
    ``dup_ngram_coverage``'s signal): every token position lying inside
    a token ``n``-gram that occurs in >= 2 distinct documents is
    dropped, and the document is rebuilt from the surviving tokens —
    the exact-substring-dedup family of Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better", ExactSubstr) at token
    granularity, the scale-practical variant of the reference's
    cross-file duplication blocks (duplication.rs). Output per doc:

    - ``n_tokens``: reference-tokenizer token count (0 for empty docs).
    - ``removed_tokens``: positions covered by at least one duplicated
      gram window (a position inside two overlapping windows counts
      once).
    - ``kept_text``: the surviving tokens joined by single spaces in
      original order ('' when everything was removed) — string-equal
      in SQL, so the oracle gates the rebuild itself, not just counts.

    Scale shape (the ``dup_ngram_coverage`` auto-switch, positions
    added):

    - Pass 1 measures the duplicated-gram set via batch-local distinct
      (doc, gram) pairs -> ``key_counts`` doc-frequency -> df >= 2.
    - Small set (<= ``broadcast_threshold``): broadcast it and rebuild
      batch-locally in ONE further streaming pass — no shuffle.
    - Large set: positional gram rows shuffle ONCE gram-aligned
      (``grouped_apply``; block-local distinct-doc count == corpus df)
      to derive duplicated (doc, start) rows, then text + starts
      union-tag into ONE doc-aligned shuffle for the rebuild (the
      C4 ``dedup_lines_rebuild`` two-data-sized-shuffles precedent;
      the join-free union-tag avoids acero's empty-partition failure,
      CLAUDE.md links.py lesson).

    Consumes ``ds`` twice on the broadcast path (pass 1 + rebuild) and
    four times on the distributed path (pass 1, positional explode,
    text tagging, row count) — pass a parquet-backed or materialized
    dataset (CLAUDE.md minhash_dedup lesson).
    """
    import pyarrow.compute as pc
    import ray

    import polars as pl

    from textalyzer_ray.stages.groups import (
        _worker_object_cache,
        grouped_apply,
        key_counts,
        partitions_for,
    )
    from textalyzer_ray.stages.tokenize import exploded_tokens

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("n_tokens", pa.int64()),
            pa.field("removed_tokens", pa.int64()),
            pa.field("kept_text", pa.string()),
        ]
    )
    explode = _ngram_explode(n, id_col, text_col)
    explode_pos = _ngram_starts_explode(n, id_col, text_col)

    def _tokens_df(t: pa.Table) -> "pl.DataFrame":
        """(id, p, word) positional tokens of a batch of (id, text)."""
        return pl.from_arrow(exploded_tokens(t, id_col, text_col)).with_columns(
            pl.col(id_col).cast(pl.Int64),
            pl.col("word").cum_count().over(id_col).cast(pl.Int64).alias("p"),
        )

    def _finish(
        toks: "pl.DataFrame", starts: "pl.DataFrame", base_ids: "pl.DataFrame"
    ) -> pa.Table:
        """Rebuild from positional tokens + duplicated gram starts.
        ``base_ids`` carries zero-token docs through."""
        covered = (
            starts.with_columns(
                pl.int_ranges(pl.col("i"), pl.col("i") + n).alias("p")
            )
            .explode("p")
            .select([id_col, pl.col("p").cast(pl.Int64)])
            .unique()
        )
        kept = (
            toks.join(covered, on=[id_col, "p"], how="anti")
            .sort([id_col, "p"])
            .group_by(id_col, maintain_order=True)
            .agg(pl.col("word").str.join(" ").alias("kept_text"))
        )
        tot = toks.group_by(id_col).agg(
            pl.len().cast(pl.Int64).alias("n_tokens")
        )
        rem = covered.group_by(id_col).agg(
            pl.len().cast(pl.Int64).alias("removed_tokens")
        )
        return (
            base_ids.join(tot, on=id_col, how="left")
            .join(rem, on=id_col, how="left")
            .join(kept, on=id_col, how="left")
            .with_columns(
                pl.col("n_tokens").fill_null(0),
                pl.col("removed_tokens").fill_null(0),
                pl.col("kept_text").fill_null(""),
            )
            .select(out_schema.names)
            .to_arrow()
            .cast(out_schema)
        )

    # --- pass 1: duplicated-gram set (df >= 2), measured ---
    def distinct_pairs(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(explode(t))
            .unique([id_col, "gram"])
            .to_arrow()
            .cast(
                pa.schema(
                    [pa.field(id_col, pa.int64()), pa.field("gram", pa.string())]
                )
            )
        )

    dup_set = (
        key_counts(ds.map_batches(distinct_pairs, batch_format="pyarrow"), ["gram"])
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["count"], 2)).select(["gram"]),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_dup = dup_set.count()

    if n_dup <= broadcast_threshold:
        dup_tbl = (
            pa.concat_tables(
                list(dup_set.iter_batches(batch_size=None, batch_format="pyarrow"))
            )
            if n_dup
            else pa.schema([pa.field("gram", pa.string())]).empty_table()
        )
        dup_ref = ray.put(dup_tbl)

        def rebuild(t: pa.Table) -> pa.Table:
            cache = _worker_object_cache()
            ck = dup_ref.hex() if hasattr(dup_ref, "hex") else str(dup_ref)
            dupdf = cache.get(ck)
            if dupdf is None:
                dupdf = cache[ck] = pl.from_arrow(ray.get(dup_ref)).select("gram")
            starts = (
                pl.from_arrow(explode_pos(t))
                .join(dupdf, on="gram", how="semi")
                .select([id_col, "i"])
            )
            base = pl.from_arrow(t.select([id_col])).cast({id_col: pl.Int64})
            return _finish(_tokens_df(t), starts, base)

        return ds.map_batches(rebuild, batch_format="pyarrow")

    logger.info(
        "dup_span_removal: %d dup grams > broadcast_threshold=%d — "
        "distributed gram-aligned path",
        n_dup,
        broadcast_threshold,
    )
    pos = ds.map_batches(explode_pos, batch_format="pyarrow").materialize()
    npart = partitions_for(pos.count(), rows_per_part=5_000_000)

    def keep_dup_starts(t: pa.Table) -> pa.Table:
        # gram-aligned block: block-local distinct-doc count == corpus df
        return (
            pl.from_arrow(t)
            .filter(pl.col(id_col).n_unique().over("gram") >= 2)
            .select([id_col, "i"])
            .to_arrow()
            .cast(pa.schema([pa.field(id_col, pa.int64()), pa.field("i", pa.int64())]))
        )

    dup_starts = grouped_apply(pos, ["gram"], keep_dup_starts, num_partitions=npart)

    tag_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("i", pa.int64()),
            pa.field(text_col, pa.string()),
        ]
    )

    def tag_text(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .select(
                pl.col(id_col).cast(pl.Int64),
                pl.lit(0, dtype=pl.Int64).alias("i"),
                pl.col(text_col).cast(pl.String),
            )
            .to_arrow()
            .cast(tag_schema)
        )

    def tag_starts(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t)
            .select(
                pl.col(id_col),
                pl.col("i"),
                pl.lit("").alias(text_col),
            )
            .to_arrow()
            .cast(tag_schema)
        )

    tagged = ds.map_batches(tag_text, batch_format="pyarrow").union(
        dup_starts.map_batches(tag_starts, batch_format="pyarrow")
    )

    def rebuild_group(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        texts = df.filter(pl.col("i") == 0).select([id_col, text_col])
        starts = df.filter(pl.col("i") > 0).select([id_col, "i"])
        tt = texts.to_arrow().cast(
            pa.schema([pa.field(id_col, pa.int64()), pa.field(text_col, pa.string())])
        )
        return _finish(_tokens_df(tt), starts, texts.select([id_col]))

    n_docs = ds.count()
    return grouped_apply(
        tagged,
        [id_col],
        rebuild_group,
        num_partitions=partitions_for(n_docs, rows_per_part=500_000),
    )


def length_quantile_filter(
    ds: Dataset,
    q: float = 0.25,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Per-group length-percentile floor: drop every document whose
    token count falls below its group's ``q``-quantile — the
    "per-language length floor" curation rule (quality thresholds set
    per language so low-resource languages aren't gated by
    high-resource length norms; CCNet percentile buckets, Laurençon et
    al. 2022 ROOTS filtering). Quantile semantics match
    ``chars_quantiles``: the cutoff is the value at rank
    ``ceil(q * n_group)`` (min value whose rank reaches it), ties at
    the cutoff are KEPT — integer-exact, so the oracle hash-gates it.
    Pick ``q`` with an exact binary representation (0.25, 0.5, 0.125…)
    so ``ceil(q*n)`` is bit-identical in Python and SQL.

    Scale shape: pass 1 streams per-batch (group, n_tokens) value
    counts into ``key_counts`` (skew-free partial merge); the driver
    sees only the (group, value, count) HISTOGRAM — bounded by
    groups x distinct lengths, never rows — computes each group's
    cutoff by cumulative count, and broadcasts the tiny cutoff dict.
    Pass 2 recomputes per-doc counts batch-locally and filters —
    zero further shuffle. Consumes ``ds`` twice: pass a parquet-backed
    or materialized dataset (CLAUDE.md minhash_dedup lesson).
    """
    import math

    import polars as pl
    import ray

    from textalyzer_ray.stages.groups import _worker_object_cache, key_counts
    from textalyzer_ray.stages.tokenize import doc_token_counts

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field(group_col, pa.string()),
            pa.field("n_tokens", pa.int64()),
        ]
    )

    def with_counts(t: pa.Table) -> pa.Table:
        counts = doc_token_counts(t, id_col=id_col, text_col=text_col)
        return (
            pl.from_arrow(t.select([id_col, group_col]))
            .with_columns(
                pl.Series("n_tokens", counts["n_tokens"].to_numpy(
                    zero_copy_only=False
                )),
                pl.col(id_col).cast(pl.Int64),
            )
            .select(out_schema.names)
            .to_arrow()
            .cast(out_schema)
        )

    def value_counts(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(with_counts(t))
            .group_by([group_col, "n_tokens"])
            .len()
            .with_columns(pl.col("len").cast(pl.Int64).alias("rows"))
            .select([group_col, "n_tokens", "rows"])
            .to_arrow()
            .cast(
                pa.schema(
                    [
                        pa.field(group_col, pa.string()),
                        pa.field("n_tokens", pa.int64()),
                        pa.field("rows", pa.int64()),
                    ]
                )
            )
        )

    hist = pa.concat_tables(
        key_counts(
            ds.map_batches(value_counts, batch_format="pyarrow"),
            [group_col, "n_tokens"],
            sum_cols=["rows"],
        ).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    cuts: dict[str, int] = {}
    hdf = pl.from_arrow(hist).sort([group_col, "n_tokens"])
    for (g,), gdf in hdf.group_by([group_col], maintain_order=True):
        n = int(gdf["sum_rows"].sum())
        rank = max(1, math.ceil(q * n))
        cum = 0
        for v, c in zip(gdf["n_tokens"], gdf["sum_rows"]):
            cum += int(c)
            if cum >= rank:
                cuts[g] = int(v)
                break
    cuts_ref = ray.put(cuts)

    def keep(t: pa.Table) -> pa.Table:
        cache = _worker_object_cache()
        ck = cuts_ref.hex() if hasattr(cuts_ref, "hex") else str(cuts_ref)
        c = cache.get(ck)
        if c is None:
            c = cache[ck] = ray.get(cuts_ref)
        df = pl.from_arrow(with_counts(t))
        cut_expr = pl.col(group_col).replace_strict(
            old=list(c.keys()), new=list(c.values()), default=0
        )
        return (
            df.filter(pl.col("n_tokens") >= cut_expr)
            .to_arrow()
            .cast(out_schema)
        )

    return ds.map_batches(keep, batch_format="pyarrow")


def nfc_clean(
    ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Unicode text normalization for ingest (the cleanup pass ahead of
    tokenize/dedup in CCNet/OSCAR-style pipelines): NFC-normalize, strip
    C0 control characters except \\n and \\t (plus DEL), then collapse
    runs of spaces/tabs to one space. Per-doc output is
    (id, n_raw, n_clean, clean_text) with BYTE lengths (CLAUDE.md byte
    semantics), so the oracle gates both the rebuilt string and the
    normalization deltas.

    Zero-shuffle: one vectorized polars pass per batch (Rust NFC kernel
    + two compiled-regex rewrites — no Python per-row loop). Engine
    parity with DuckDB ``nfc_normalize`` + RE2 ``regexp_replace`` is
    exact for NFC (a normal form, not a locale mapping) and verified
    on planted NFD/control/whitespace payloads in
    tests/test_pipelines_curation.py and the ``nfc_clean`` driver
    oracle."""
    import polars as pl

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("n_raw", pa.int64()),
            pa.field("n_clean", pa.int64()),
            pa.field("clean_text", pa.string()),
        ]
    )

    def clean(t: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(t.select([id_col, text_col]))
            .with_columns(
                pl.col(id_col).cast(pl.Int64),
                pl.col(text_col)
                .str.normalize("NFC")
                .str.replace_all(r"[\x00-\x08\x0B-\x1F\x7F]", "")
                .str.replace_all(r"[ \t]+", " ")
                .alias("clean_text"),
            )
            .with_columns(
                pl.col(text_col).str.len_bytes().cast(pl.Int64).alias("n_raw"),
                pl.col("clean_text")
                .str.len_bytes()
                .cast(pl.Int64)
                .alias("n_clean"),
            )
            .select(out_schema.names)
            .to_arrow()
            .cast(out_schema)
        )

    return ds.map_batches(clean, batch_format="pyarrow")


# xxhash prime3 — independent of hash_split (Knuth) and mixture_sample
# (xxhash prime2), so shuffle order is uncorrelated with split/mixture.
_SHUF_MULT = 3266489917


def shard_shuffle(
    ds: Dataset,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> Dataset:
    """Deterministic global shuffle into training shards: every row gets
    shard = hash(id) % n_shards and a within-shard rank ordered by
    (hash, id) — the RNG-free "global random order, then split into
    shard files" step that precedes training-data serialization.
    Reproducible across runs, engines and partitionings (the hash IS
    the permutation; no RNG state, no seed file), ties (hash
    collisions) made total by id; independent of ``hash_split`` /
    ``mixture_sample`` (distinct multiplier), so shuffle order carries
    no correlation into the split or the mixture. Consumes ``ds``
    twice (row count + assignment) — pass a parquet-backed or
    materialized dataset.

    Scale shape: the hash + shard assignment is one zero-shuffle
    vectorized pass; ranking happens on shard-ALIGNED blocks
    (``grouped_apply`` — exactly one exchange, the one a shard writer
    needs anyway so each output file is one block's write), with a
    block-local sort standing in for the global one (hash-partitioning
    by shard makes block-local rank == shard rank). Downstream, a
    writer maps each shard block to one resumable output file.
    """
    import numpy as np
    import polars as pl

    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("shard_id", pa.int64()),
            pa.field("shard_rank", pa.int64()),
        ]
    )

    def assign(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids & (_M32 - 1)) * _SHUF_MULT) & (_M32 - 1)
        return pa.table(
            {
                id_col: pa.array(ids.astype(np.int64)),
                "shard_id": pa.array((h % n_shards).astype(np.int64)),
                "_h": pa.array(h.astype(np.int64)),
            }
        )

    def rank_shard(t: pa.Table) -> pa.Table:
        # shard-aligned block: local rank == global shard rank
        return (
            pl.from_arrow(t)
            .sort(["shard_id", "_h", id_col])
            .with_columns(
                (pl.int_range(pl.len()) + 1)
                .over("shard_id")
                .cast(pl.Int64)
                .alias("shard_rank")
            )
            .select(out_schema.names)
            .to_arrow()
            .cast(out_schema)
        )

    n_rows = ds.count()
    return grouped_apply(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["shard_id"],
        rank_shard,
        num_partitions=min(n_shards, partitions_for(n_rows)),
    )


def blocklist_audit(
    ds: Dataset,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Blocklist (badwords) audit — the C4-style term filter with
    counts: per doc, how many token occurrences match the broadcast
    ``terms`` list, and whether the doc survives (kept = no hits).
    Output (id_col, n_hits, kept), all BIGINT (kept as 0/1).

    Scale shape: the term list is query-sized and lives in the batch
    closure; ONE streaming tokenize pass per batch does a vectorized
    ``pc.is_in`` over the flat token array + a segment-sum back to
    docs — zero shuffle, zero state. For million-entry lexicons swap
    the closure list for a ``ray.put`` set probed the same way (the
    decontaminate broadcast pattern)."""
    import numpy as np
    import pyarrow.compute as pc

    from textalyzer_ray.stages.tokenize import _flat_tokens

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("n_hits", pa.int64()),
            pa.field("kept", pa.int64()),
        ]
    )
    term_arr = pa.array(sorted(set(terms)), pa.string())

    def audit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        tokens, parents = _flat_tokens(t, text_col)
        n = t.num_rows
        hits = np.zeros(n, dtype=np.int64)
        if len(tokens):
            m = pc.is_in(tokens, value_set=term_arr)
            mnp = m.to_numpy(zero_copy_only=False)
            par = parents.to_numpy(zero_copy_only=False)
            np.add.at(hits, par[mnp], 1)
        return pa.table(
            {
                id_col: t[id_col],
                "n_hits": pa.array(hits),
                "kept": pa.array((hits == 0).astype(np.int64)),
            },
            schema=out_schema,
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        audit, batch_format="pyarrow", zero_copy_batch=True
    )


def quota_select(
    ds_docs: Dataset,
    group_col: str = "source",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    budget: int = 20_000,
) -> Dataset:
    """Per-group cumulative quota selection: within each group order
    rows by (value DESC, id ASC) and keep rows while the RUNNING total
    (inclusive of the current row) stays <= ``budget`` — the per-host
    byte-budget cut a balanced training mixture applies so one giant
    source cannot dominate. All-integer (running sums of BIGINTs), so
    the SQL window-function oracle is exact.

    ONE key-aligned exchange on ``group_col`` (each group wholly in a
    block) sized to the measured row count, then a vectorized polars
    sort + cum_sum per block. Output (id_col, group_col, value_col,
    cum) for KEPT rows, sorted by id_col."""
    import polars as pl

    from textalyzer_ray.stages.groups import grouped_apply, partitions_for

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field(group_col, pa.string()),
            pa.field(value_col, pa.int64()),
            pa.field("cum", pa.int64()),
        ]
    )

    def select_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = (
            pl.from_arrow(t)
            .sort(
                [group_col, value_col, id_col],
                descending=[False, True, False],
            )
            .with_columns(
                pl.col(value_col)
                .cum_sum()
                .over(group_col)
                .cast(pl.Int64)
                .alias("cum")
            )
            .filter(pl.col("cum") <= budget)
            .select([id_col, group_col, value_col, "cum"])
        )
        return df.to_arrow().cast(out_schema)

    narrow = ds_docs.select_columns(
        [id_col, group_col, value_col]
    ).materialize()
    return grouped_apply(
        narrow,
        [group_col],
        select_block,
        num_partitions=partitions_for(narrow.count()),
    ).sort(id_col)


def novelty_scores(
    ds: Dataset,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Per-document content novelty in corpus order: the fraction of a
    doc's DISTINCT token n-grams whose corpus-wide FIRST owner (min
    ``id_col``; ids are the crawl order here — webgen's warc_ts is
    monotone in doc_id) is this doc. The crawl-quality signal a
    frontier scheduler ranks hosts by: a page that re-serves already-
    crawled shingles scores ~0, a page contributing fresh content ~1
    (Olston & Najork, Web Crawling, F&T IR 2010 §6 recrawl/value
    policies; gram semantics shared with dup_ngram_coverage).

    Scale shape: per-batch DISTINCT (doc, gram) pairs (each doc sits
    whole in one row, so batch-local dedup is globally exact) -> ONE
    gram-aligned exchange where first ownership is a vectorized
    window-min per gram (zero per-group Python; a gram shared by k
    docs puts k rows in its block — the dup_ngram_coverage hot-gram
    caveat applies) -> ONE doc-aligned key_counts merge of (distinct,
    new) credits. Gram strings ride the first exchange (<= ~n tokens
    each); text dies at featurize.

    -> (doc_id, n_distinct, n_new, novelty) for docs with >= 1 gram
    (novelty is undefined below ``n`` tokens — callers wanting every
    doc left-join against the corpus). novelty = n_new / n_distinct is
    ONE int/int double division — IEEE-identical across engines, so
    the float column is value-hash safe raw. Sorted by doc_id."""
    import polars as pl

    from textalyzer_ray.stages.groups import (
        grouped_apply,
        key_counts,
        partitions_for,
    )

    explode = _ngram_explode(n, id_col, text_col)
    pairs_schema = pa.schema(
        [pa.field(id_col, pa.int64()), pa.field("gram", pa.string())]
    )

    def distinct_pairs(t: pa.Table) -> pa.Table:
        g = explode(t)
        if g.num_rows == 0:
            return pairs_schema.empty_table()
        return (
            pl.from_arrow(g)
            .unique([id_col, "gram"])
            .to_arrow()
            .cast(pairs_schema)
        )

    pairs = (
        ds.select_columns([id_col, text_col])
        .map_batches(distinct_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    n_pairs = pairs.count()

    credit_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("one", pa.int64()),
            pa.field("new", pa.int64()),
        ]
    )

    def credit_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return credit_schema.empty_table()
        return (
            pl.from_arrow(t)
            .with_columns(
                pl.lit(1, dtype=pl.Int64).alias("one"),
                (pl.col(id_col) == pl.col(id_col).min().over("gram"))
                .cast(pl.Int64)
                .alias("new"),
            )
            .select([id_col, "one", "new"])
            .to_arrow()
            .cast(credit_schema)
        )

    credits = grouped_apply(
        pairs,
        ["gram"],
        credit_block,
        num_partitions=partitions_for(n_pairs),
    )

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("n_distinct", pa.int64()),
            pa.field("n_new", pa.int64()),
            pa.field("novelty", pa.float64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        nd = t["sum_one"].to_pylist()
        nn = t["sum_new"].to_pylist()
        return pa.table(
            {
                id_col: t[id_col],
                "n_distinct": pa.array(nd, pa.int64()),
                "n_new": pa.array(nn, pa.int64()),
                "novelty": pa.array(
                    [b / a for a, b in zip(nd, nn)], pa.float64()
                ),
            },
            schema=out_schema,
        )

    return (
        key_counts(credits, [id_col], sum_cols=["one", "new"])
        .map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
        .sort(id_col)
    )


def source_overlap(
    ds: Dataset,
    n: int = 3,
    group_col: str = "source",
    text_col: str = "text",
) -> Dataset:
    """Pairwise cross-source n-gram contamination matrix: for every
    source pair (a < b), how many DISTINCT token n-grams they share,
    each side's distinct-gram total, and the containment ratio
    n_shared / min(n_a, n_b) — the audit a mixture designer runs
    before weighting sources (a leaked dump shows up as a ~1.0
    containment edge; same signal family as decontaminate, lifted
    from train-vs-eval to all-pairs-of-sources).

    Scale shape: per-batch DISTINCT (source, gram) pairs -> ONE
    gram-aligned exchange; within each key-aligned block a polars
    self-join on gram emits (a, b) rows (a gram in k sources emits
    k(k-1)/2 — k is bounded by the schema-bounded source cardinality,
    the module's per-key contract, NOT by the corpus) -> ONE tiny
    pair-keyed key_counts merge; totals ride a second key_counts on
    the same materialized pair set. Containment is int/int (IEEE
    parity, hash-safe raw).

    -> (source_a, source_b, n_shared, n_a, n_b, containment), sorted;
    only pairs sharing >= 1 gram appear."""
    import polars as pl

    from textalyzer_ray.stages.groups import (
        grouped_apply,
        key_counts,
        partitions_for,
    )

    # grams are formed PER DOCUMENT (never across docs of a source —
    # that would make the gram set depend on batching), then projected
    # onto the source label
    explode = _ngram_explode(n, "doc_id", text_col)
    pairs_schema = pa.schema(
        [pa.field(group_col, pa.string()), pa.field("gram", pa.string())]
    )

    def distinct_pairs(t: pa.Table) -> pa.Table:
        g = explode(t)
        if g.num_rows == 0:
            return pairs_schema.empty_table()
        lab = pl.from_arrow(t.select(["doc_id", group_col]))
        return (
            pl.from_arrow(g)
            .join(lab, on="doc_id")
            .unique([group_col, "gram"])
            .select([group_col, "gram"])
            .to_arrow()
            .cast(pairs_schema)
        )

    # batch-local distinct is NOT globally distinct here (a source
    # spans many docs/batches), so dedup again inside the gram-aligned
    # block before pairing
    sg = (
        ds.select_columns(["doc_id", group_col, text_col])
        .map_batches(distinct_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    n_sg = sg.count()

    edge_schema = pa.schema(
        [
            pa.field("source_a", pa.string()),
            pa.field("source_b", pa.string()),
            pa.field("one", pa.int64()),
        ]
    )

    def pair_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return edge_schema.empty_table()
        df = pl.from_arrow(t).unique([group_col, "gram"])
        j = df.join(df, on="gram", suffix="_b").filter(
            pl.col(group_col) < pl.col(f"{group_col}_b")
        )
        return (
            j.select(
                pl.col(group_col).alias("source_a"),
                pl.col(f"{group_col}_b").alias("source_b"),
                pl.lit(1, dtype=pl.Int64).alias("one"),
            )
            .to_arrow()
            .cast(edge_schema)
        )

    edges = key_counts(
        grouped_apply(
            sg,
            ["gram"],
            pair_block,
            num_partitions=partitions_for(n_sg),
        ),
        ["source_a", "source_b"],
        sum_cols=["one"],
    )

    # per-source distinct gram totals: global dedup via the same
    # gram-aligned exchange shape, keyed on (source, gram)
    tot_schema = pa.schema(
        [pa.field(group_col, pa.string()), pa.field("one", pa.int64())]
    )

    def tot_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return tot_schema.empty_table()
        return (
            pl.from_arrow(t)
            .unique([group_col, "gram"])
            .select(
                pl.col(group_col),
                pl.lit(1, dtype=pl.Int64).alias("one"),
            )
            .to_arrow()
            .cast(tot_schema)
        )

    totals = {
        r[group_col]: r["sum_one"]
        for r in key_counts(
            grouped_apply(
                sg,
                ["gram"],
                tot_block,
                num_partitions=partitions_for(n_sg),
            ),
            [group_col],
            sum_cols=["one"],
        ).take_all()
    }

    out_schema = pa.schema(
        [
            pa.field("source_a", pa.string()),
            pa.field("source_b", pa.string()),
            pa.field("n_shared", pa.int64()),
            pa.field("n_a", pa.int64()),
            pa.field("n_b", pa.int64()),
            pa.field("containment", pa.float64()),
        ]
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        a = t["source_a"].to_pylist()
        b = t["source_b"].to_pylist()
        sh = t["sum_one"].to_pylist()
        na = [totals[x] for x in a]
        nb = [totals[x] for x in b]
        return pa.table(
            {
                "source_a": pa.array(a, pa.string()),
                "source_b": pa.array(b, pa.string()),
                "n_shared": pa.array(sh, pa.int64()),
                "n_a": pa.array(na, pa.int64()),
                "n_b": pa.array(nb, pa.int64()),
                "containment": pa.array(
                    [s / min(x, y) for s, x, y in zip(sh, na, nb)],
                    pa.float64(),
                ),
            },
            schema=out_schema,
        )

    return edges.map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["source_a", "source_b"])


def coverage_select(
    ds: Dataset,
    k: int = 6,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    small_threshold: int = 2_000_000,
) -> Dataset:
    """Greedy maximum-coverage document selection: pick up to ``k``
    docs, each round the one adding the most not-yet-covered DISTINCT
    token n-grams (ties to the lowest id; a round with zero marginal
    gain stops early) — the Nemhauser-Wolsey-Fisher 1978 greedy
    (1-1/e guarantee) that submodular data-subset selection uses to
    squeeze maximal feature coverage into a token budget. Fully
    deterministic, so the SQL oracle unrolls the identical k rounds
    as MATERIALIZED CTEs.

    Measured-size switch (the BPE/BFS pattern): below
    ``small_threshold`` distinct (doc, gram) pairs the whole greedy
    runs in ONE remote task over the pair block refs. Above it, each
    round is TWO streaming passes over the materialized pairs — a
    score pass (per-block per-doc uncovered counts; each doc's grams
    sit whole in one block since a doc is one featurize row, so block
    argmax partials reduce exactly on the driver) and a winner-gram
    fetch — with the covered set broadcast via ray.put + the
    per-worker object cache (bounded by k x max grams/doc, never
    corpus-sized).

    -> (round, doc_id, gain, covered), round = 1.., covered = running
    total; all BIGINT."""
    import numpy as np
    import polars as pl
    import ray
    import ray.data as rd

    from textalyzer_ray.stages.groups import _worker_object_cache

    explode = _ngram_explode(n, id_col, text_col)
    pairs_schema = pa.schema(
        [pa.field(id_col, pa.int64()), pa.field("gram", pa.string())]
    )

    def distinct_pairs(t: pa.Table) -> pa.Table:
        g = explode(t)
        if g.num_rows == 0:
            return pairs_schema.empty_table()
        return (
            pl.from_arrow(g)
            .unique([id_col, "gram"])
            .to_arrow()
            .cast(pairs_schema)
        )

    pairs = (
        ds.select_columns([id_col, text_col])
        .map_batches(distinct_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    n_pairs = pairs.count()

    out_schema = pa.schema(
        [
            pa.field("round", pa.int64()),
            pa.field(id_col, pa.int64()),
            pa.field("gain", pa.int64()),
            pa.field("covered", pa.int64()),
        ]
    )

    def greedy(doc: np.ndarray, gram: np.ndarray) -> pa.Table:
        rounds, sel, gains = [], [], []
        alive = np.ones(len(doc), dtype=bool)
        for r in range(1, k + 1):
            if not alive.any():
                break
            d = doc[alive]
            order = np.argsort(d, kind="stable")
            uniq, cnt = np.unique(d[order], return_counts=True)
            best = np.argmax(cnt)  # first max -> lowest doc_id on tie
            if cnt[best] == 0:
                break
            win = uniq[best]
            rounds.append(r)
            sel.append(int(win))
            gains.append(int(cnt[best]))
            covered_mask = np.isin(gram, gram[alive & (doc == win)])
            alive &= ~covered_mask
        return pa.table(
            {
                "round": pa.array(rounds, pa.int64()),
                id_col: pa.array(sel, pa.int64()),
                "gain": pa.array(gains, pa.int64()),
                "covered": pa.array(
                    np.cumsum(np.array(gains, dtype=np.int64)), pa.int64()
                ),
            },
            schema=out_schema,
        )

    if n_pairs <= small_threshold:

        @ray.remote
        def greedy_task(*blocks: pa.Table) -> pa.Table:
            doc = np.concatenate(
                [b[id_col].to_numpy(zero_copy_only=False) for b in blocks]
                or [np.empty(0, np.int64)]
            )
            gram = np.concatenate(
                [
                    b["gram"].to_numpy(zero_copy_only=False).astype(object)
                    for b in blocks
                ]
                or [np.empty(0, object)]
            )
            return greedy(doc, gram)

        return rd.from_arrow_refs(
            [greedy_task.remote(*pairs.to_arrow_refs())]
        )

    # ---- distributed rounds (two streaming passes per round) ----
    rounds_out: list[tuple[int, int, int]] = []
    covered_ref = ray.put(frozenset())
    selected: set[int] = set()
    for r in range(1, k + 1):

        def score_pass(
            t: pa.Table, _cref=covered_ref, _sel=frozenset(selected)
        ) -> pa.Table:
            cache = _worker_object_cache()
            key = _cref.hex() if hasattr(_cref, "hex") else str(_cref)
            cov = cache.get(key)
            if cov is None:
                cov = cache[key] = ray.get(_cref)
            df = pl.from_arrow(t).filter(
                ~pl.col(id_col).is_in(list(_sel) or [-1])
                & ~pl.col("gram").is_in(list(cov) or [""])
            )
            if df.height == 0:
                return pa.table(
                    {id_col: pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
                )
            per = (
                df.group_by(id_col)
                .len()
                .rename({"len": "c"})
                .with_columns(pl.col("c").cast(pl.Int64))
                .sort(["c", id_col], descending=[True, False])
                .head(1)
            )
            return per.to_arrow().cast(
                pa.schema([pa.field(id_col, pa.int64()), pa.field("c", pa.int64())])
            )

        best = pairs.map_batches(
            score_pass,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,  # doc-whole blocks: argmax partials exact
        ).take_all()
        if not best:
            break
        best.sort(key=lambda x: (-x["c"], x[id_col]))
        win, gain = int(best[0][id_col]), int(best[0]["c"])
        if gain == 0:
            break
        rounds_out.append((r, win, gain))
        selected.add(win)

        def fetch_pass(
            t: pa.Table, _cref=covered_ref, _win=win
        ) -> pa.Table:
            cache = _worker_object_cache()
            key = _cref.hex() if hasattr(_cref, "hex") else str(_cref)
            cov = cache.get(key)
            if cov is None:
                cov = cache[key] = ray.get(_cref)
            df = pl.from_arrow(t).filter(
                (pl.col(id_col) == _win) & ~pl.col("gram").is_in(list(cov) or [""])
            )
            return df.select("gram").to_arrow().cast(
                pa.schema([pa.field("gram", pa.string())])
            )

        new_grams = {
            r2["gram"]
            for r2 in pairs.map_batches(
                fetch_pass,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=None,
            ).take_all()
        }
        covered_ref = ray.put(frozenset(ray.get(covered_ref) | new_grams))

    gains = [g for _, _, g in rounds_out]
    return rd.from_arrow(
        pa.table(
            {
                "round": pa.array([r for r, _, _ in rounds_out], pa.int64()),
                id_col: pa.array([d for _, d, _ in rounds_out], pa.int64()),
                "gain": pa.array(gains, pa.int64()),
                "covered": pa.array(
                    np.cumsum(np.array(gains, dtype=np.int64)).tolist()
                    if gains
                    else [],
                    pa.int64(),
                ),
            },
            schema=out_schema,
        )
    )
