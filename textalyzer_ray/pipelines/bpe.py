"""BPE tokenizer training over a corpus-aggregated vocabulary —
the classic byte-pair-encoding trainer (Sennrich et al. 2016) in the
get_stats / greedy-leftmost-merge formulation every modern tokenizer
library implements, expressed Ray-Data-first.

Scale shape: the trainer NEVER touches the corpus — it runs over the
aggregated (word, count) vocabulary table (the output of the existing
word-histogram partials), which is bounded by distinct-word count, not
corpus size. Each merge round is:

1. one streaming ``map_batches`` pass emitting batch-local partial
   (left, right, weight) pair counts (overlapping occurrences counted,
   the classic get_stats semantics),
2. a ``key_counts`` partial-merge (skew-free: a hot pair's weight
   arrives pre-combined per block),
3. per-block argmax rows -> the driver reduces only blocks-many
   candidate rows to the global best pair (count desc, pair lex asc —
   the deterministic tie rule),
4. one vectorized ``map_batches`` pass applying the merge greedily
   left-to-right (flat symbol arrays + offsets; consecutive-match
   chains — only possible when left == right — keep every other
   match, reproducing the sequential scan without per-row Python).

The evolving symbol table is materialized once per round (vocab-sized,
never corpus-sized). The driver holds only the merge list.

Reference tokenizer parity: words come from the same tokenization the
rest of the repo pins (core/textmetrics.py), so the trained merges are
reproducible bit-for-bit in SQL — see the unrolled oracle in
__ray_entry__._bpe_oracle_sql.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

SYMS_TYPE = pa.list_(pa.string())


def _flat_view(t: pa.Table, syms_col: str):
    """(flat_symbols:np.object, word_id_per_flat:np.int64, lens) via
    pc.list_flatten / list_value_length — unlike raw ``.offsets`` /
    ``.values`` these respect a sliced array's offset."""
    import pyarrow.compute as pc

    col = t[syms_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    flat = np.asarray(pc.list_flatten(col).to_pylist(), dtype=object)
    word_id = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return flat, word_id, lens


def _greedy_matches(flat, word_id, a: str, b: str) -> np.ndarray:
    """Indices i where (flat[i], flat[i+1]) == (a, b) within one word,
    after greedy left-to-right non-overlap resolution."""
    if len(flat) < 2:
        return np.empty(0, dtype=np.int64)
    match = (flat[:-1] == a) & (flat[1:] == b) & (word_id[:-1] == word_id[1:])
    idx = np.flatnonzero(match)
    if len(idx) < 2:
        return idx
    # consecutive matched positions form chains (possible only when
    # a == b); the sequential scan keeps every other match in a chain
    chain = np.cumsum(np.concatenate([[0], (np.diff(idx) != 1).astype(np.int64)]))
    _, first = np.unique(chain, return_index=True)
    rank = np.arange(len(idx)) - first[chain]
    return idx[rank % 2 == 0]


def bpe_train(
    words: Dataset,
    n_merges: int = 6,
    word_col: str = "word",
    count_col: str = "count",
    return_state: bool = False,
    small_threshold: int = 2_000_000,
) -> pa.Table:
    """Train ``n_merges`` BPE merges over an aggregated (word, count)
    dataset -> pa.Table (rank, left, right, pair_count) — the merge
    list a tokenizer serializes. Deterministic: global argmax by
    (count desc, left asc, right asc). With ``return_state`` True,
    returns (merges, state_dataset) where state is the post-merge
    (word, count, syms) vocabulary — the trained tokenizer's word
    segmentation, what ``bpe_doc_token_counts`` applies.

    Consumes ``words`` once; the per-round symbol state is materialized
    (vocab-sized) and consumed twice per round (pair counting + merge
    application).

    Measured-size small path (CLAUDE.md one-task-loop lesson: iterative
    Dataset loops pay operator startup EVERY round): when the vocab has
    <= ``small_threshold`` words, ONE remote task runs all rounds over
    the word block refs with the same vectorized kernels — blocks never
    land on the driver, and at a ~30-word bench vocabulary this removes
    8 rounds x 2 Ray passes of pure fixed cost.
    """
    import polars as pl
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from textalyzer_ray.stages.groups import key_counts

    def init_syms(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([word_col, count_col])).with_columns(
            pl.col(word_col).str.extract_all(r"(?s).").alias("syms"),
            pl.col(count_col).cast(pl.Int64),
        )
        return df.to_arrow().cast(
            pa.schema(
                [
                    pa.field(word_col, pa.string()),
                    pa.field(count_col, pa.int64()),
                    pa.field("syms", SYMS_TYPE),
                ]
            )
        )

    state = words.map_batches(init_syms, batch_format="pyarrow").materialize()

    if state.count() <= small_threshold:

        @ray.remote(num_returns=2)
        def train_local(n: int, *blocks: pa.Table):
            t = pa.concat_tables(blocks)
            flat, word_id, lens = _flat_view(t, "syms")
            counts = t[count_col].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            local_merges = []
            for _ in range(n):
                if len(flat) < 2:
                    break
                same = word_id[:-1] == word_id[1:]
                if not same.any():
                    break
                import polars as pl2

                best = (
                    pl2.DataFrame(
                        {
                            "l": flat[:-1][same],
                            "r": flat[1:][same],
                            "w": counts[word_id[:-1][same]],
                        }
                    )
                    .group_by(["l", "r"])
                    .agg(pl2.col("w").sum())
                    .sort(["w", "l", "r"], descending=[True, False, False])
                    .head(1)
                )
                a, b, w = (
                    best["l"][0],
                    best["r"][0],
                    int(best["w"][0]),
                )
                local_merges.append((a, b, w))
                keep = _greedy_matches(flat, word_id, a, b)
                if len(keep):
                    flat = flat.copy()
                    flat[keep] = a + b
                    drop = np.zeros(len(flat), dtype=bool)
                    drop[keep + 1] = True
                    dels = np.zeros(t.num_rows, dtype=np.int64)
                    np.add.at(dels, word_id[keep], 1)
                    lens = lens - dels
                    flat = flat[~drop]
                    word_id = np.repeat(
                        np.arange(t.num_rows, dtype=np.int64), lens
                    )
            merges_tbl = pa.table(
                {
                    "rank": pa.array(
                        range(1, len(local_merges) + 1), pa.int64()
                    ),
                    "left": pa.array([m[0] for m in local_merges], pa.string()),
                    "right": pa.array(
                        [m[1] for m in local_merges], pa.string()
                    ),
                    "pair_count": pa.array(
                        [m[2] for m in local_merges], pa.int64()
                    ),
                }
            )
            offs = np.concatenate([[0], np.cumsum(lens)])
            state_tbl = pa.table(
                {
                    word_col: t[word_col],
                    count_col: t[count_col],
                    "syms": pa.ListArray.from_arrays(
                        pa.array(offs, pa.int32()),
                        pa.array(flat.tolist(), pa.string()),
                    ),
                },
                schema=t.schema,
            )
            return merges_tbl, state_tbl

        mref, sref = train_local.remote(n_merges, *state.to_arrow_refs())
        out = ray.get(mref)  # n_merges rows — driver-safe by contract
        if return_state:
            return out, rd.from_arrow_refs([sref])
        return out

    merges: list[tuple[str, str, int]] = []

    pair_schema = pa.schema(
        [
            pa.field("l", pa.string()),
            pa.field("r", pa.string()),
            pa.field("w", pa.int64()),
        ]
    )

    def pair_partials(t: pa.Table) -> pa.Table:
        flat, word_id, _ = _flat_view(t, "syms")
        if len(flat) < 2:
            return pair_schema.empty_table()
        same = word_id[:-1] == word_id[1:]
        if not same.any():
            return pair_schema.empty_table()
        cnt = t[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pl.DataFrame(
            {
                "l": flat[:-1][same],
                "r": flat[1:][same],
                "w": cnt[word_id[:-1][same]],
            }
        )
        return (
            df.group_by(["l", "r"])
            .agg(pl.col("w").sum())
            .to_arrow()
            .cast(pair_schema)
        )

    def local_best(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        df = pl.from_arrow(t).sort(
            ["sum_w", "l", "r"], descending=[True, False, False]
        )
        return df.head(1).to_arrow().cast(t.schema)

    for rank in range(n_merges):
        counted = key_counts(
            state.map_batches(pair_partials, batch_format="pyarrow"),
            ["l", "r"],
            sum_cols=["w"],
        )
        batches = list(
            counted.map_batches(local_best, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
        )
        if not batches:
            break
        cands = pa.concat_tables(batches)
        if cands.num_rows == 0:
            break
        rows = sorted(
            zip(
                cands["sum_w"].to_pylist(),
                cands["l"].to_pylist(),
                cands["r"].to_pylist(),
            ),
            key=lambda x: (-x[0], x[1], x[2]),
        )
        w, a, b = rows[0]
        merges.append((a, b, int(w)))

        def apply_merge(t: pa.Table, _a=a, _b=b) -> pa.Table:
            flat, word_id, lens = _flat_view(t, "syms")
            keep = _greedy_matches(flat, word_id, _a, _b)
            if len(keep) == 0:
                return t
            new_flat = flat.copy()
            new_flat[keep] = _a + _b
            drop = np.zeros(len(flat), dtype=bool)
            drop[keep + 1] = True
            new_flat = new_flat[~drop]
            dels = np.zeros(t.num_rows, dtype=np.int64)
            np.add.at(dels, word_id[keep], 1)
            new_offsets = np.concatenate([[0], np.cumsum(lens - dels)])
            syms = pa.ListArray.from_arrays(
                pa.array(new_offsets, pa.int32()),
                pa.array(new_flat.tolist(), pa.string()),
            )
            return pa.table(
                {
                    word_col: t[word_col],
                    count_col: pc.cast(t[count_col], pa.int64()),
                    "syms": syms,
                },
                schema=t.schema,
            )

        state = state.map_batches(
            apply_merge, batch_format="pyarrow"
        ).materialize()

    out = pa.table(
        {
            "rank": pa.array(range(1, len(merges) + 1), pa.int64()),
            "left": pa.array([m[0] for m in merges], pa.string()),
            "right": pa.array([m[1] for m in merges], pa.string()),
            "pair_count": pa.array([m[2] for m in merges], pa.int64()),
        }
    )
    return (out, state) if return_state else out


def bpe_doc_token_counts(
    docs: Dataset,
    n_merges: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Apply a corpus-trained BPE tokenizer to its own corpus: train
    ``n_merges`` merges over the aggregated vocabulary, then count each
    document's trained-tokenizer tokens — the "how many BPE tokens is
    my corpus" question behind token budgets, shard packing and
    mixture math. Output: (id, n_bpe_tokens:int64), 0 for empty docs.

    Scale shape: training never touches the corpus (see ``bpe_train``);
    application broadcasts only the vocab-sized (word, n_syms) map
    (``ray.put`` + per-worker cache — the lm_surprisal broadcast-model
    precedent, bounded by distinct words, not corpus rows) and the
    counting pass is one zero-shuffle vectorized join per batch.

    Consumes ``docs`` twice (vocabulary aggregation + counting) — pass
    a parquet-backed or materialized dataset.
    """
    import polars as pl
    import pyarrow.compute as pc
    import ray

    from textalyzer_ray.pipelines.frequency import word_histogram
    from textalyzer_ray.stages.groups import _worker_object_cache
    from textalyzer_ray.stages.tokenize import exploded_tokens

    _, state = bpe_train(
        word_histogram(docs.map_batches(
            lambda t: t.select([text_col]), batch_format="pyarrow"
        )),
        n_merges=n_merges,
        return_state=True,
    )

    def to_lens(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "word": t["word"],
                "n_syms": pc.cast(pc.list_value_length(t["syms"]), pa.int64()),
            }
        )

    vocab = pa.concat_tables(
        state.map_batches(to_lens, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    vref = ray.put(vocab)

    out_schema = pa.schema(
        [pa.field(id_col, pa.int64()), pa.field("n_bpe_tokens", pa.int64())]
    )

    def count_batch(t: pa.Table) -> pa.Table:
        cache = _worker_object_cache()
        ck = vref.hex() if hasattr(vref, "hex") else str(vref)
        vdf = cache.get(ck)
        if vdf is None:
            vdf = cache[ck] = pl.from_arrow(ray.get(vref))
        toks = pl.from_arrow(exploded_tokens(t, id_col, text_col)).cast(
            {id_col: pl.Int64}
        )
        per = (
            toks.join(vdf, on="word", how="left")
            .group_by(id_col)
            .agg(pl.col("n_syms").sum().cast(pl.Int64).alias("n_bpe_tokens"))
        )
        base = pl.from_arrow(t.select([id_col])).cast({id_col: pl.Int64})
        return (
            base.join(per, on=id_col, how="left")
            .with_columns(pl.col("n_bpe_tokens").fill_null(0))
            .select(out_schema.names)
            .to_arrow()
            .cast(out_schema)
        )

    return docs.map_batches(count_batch, batch_format="pyarrow")
