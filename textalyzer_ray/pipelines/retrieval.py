"""Text retrieval: BM25 scoring and top-k search over the corpus.

The reference stops at corpus frequency tables (SURVEY.md §2.6); a
training-data engine also needs the other direction — given a query,
find the documents — so this adds the classic BM25 ranked retrieval
(Robertson & Zaragoza 2009, the Okapi formulation with the
log(1 + (N - df + 0.5)/(df + 0.5)) idf that keeps scores positive).

Scale shape: the query term list is tiny and broadcast inside the
batch closure; ONE streaming pass over the text computes a compact
per-doc feature row (doc_id, dl, tf per query term — fixed-width
ints, orders of magnitude smaller than the text, which dies in the
batch); corpus statistics (N, avgdl, per-term df) are per-block sums
driver-reduced from that compact dataset (O(blocks) rows, the
per-block-sum pattern of connected components' convergence probe);
scoring is a second vectorized pass over the features with a
per-block top-k prune, so the final sort touches blocks x k candidate
rows, never the corpus. The feature dataset is materialized because
it is consumed twice (stats + scoring) and regenerating it would
re-tokenize the corpus (the minhash_dedup lesson, CLAUDE.md).
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from textalyzer_ray.stages.tokenize import _flat_tokens


def bm25_features(
    ds_docs: Dataset,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """One pass over the text: (doc_id, dl, tf_0..tf_{m-1}) for the
    broadcast query-term list, keeping only docs that contain at least
    one query term (others score 0 and can never reach a top-k).
    Vectorized: one Arrow equality scan per term over the flat token
    array (m is query-sized, ~10).

    Each batch also emits ONE sentinel row (doc_id = -1, impossible for
    real docs) carrying the batch's corpus totals — dl = batch token
    sum, tf_0 = batch doc count — so N and avgdl come out of this same
    single text scan (the sentinel-row pattern of approx_top_words;
    docs with no query term still count toward avgdl)."""
    import numpy as np

    if not terms:
        # corpus_stats reads the sentinel's tf_0 column; with no terms
        # the feature schema has no tf_* at all — fail fast here rather
        # than with a KeyError inside a Ray task.
        raise ValueError("terms must be non-empty")

    fields = [pa.field(id_col, pa.int64()), pa.field("dl", pa.int64())]
    fields += [pa.field(f"tf_{j}", pa.int64()) for j in range(len(terms))]
    feat_schema = pa.schema(fields)

    def features(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return feat_schema.empty_table()
        tokens, parents = _flat_tokens(t, text_col)
        n = t.num_rows
        dl = np.zeros(n, dtype=np.int64)
        par = parents.to_numpy(zero_copy_only=False)
        np.add.at(dl, par, 1)
        tf = np.zeros((len(terms), n), dtype=np.int64)
        for j, term in enumerate(terms):
            hit = pc.equal(tokens, term)
            if pc.any(hit).as_py():
                np.add.at(tf[j], par[hit.to_numpy(zero_copy_only=False)], 1)
        keep = tf.sum(axis=0) > 0
        ids = np.concatenate(
            [
                t[id_col].to_numpy(zero_copy_only=False)[keep],
                np.array([-1], dtype=np.int64),
            ]
        )
        cols = {
            id_col: pa.array(ids, pa.int64()),
            "dl": pa.array(np.concatenate([dl[keep], [int(dl.sum())]])),
        }
        for j in range(len(terms)):
            sent = n if j == 0 else 0
            cols[f"tf_{j}"] = pa.array(
                np.concatenate([tf[j][keep], [sent]]).astype(np.int64)
            )
        return pa.table(cols, schema=feat_schema)

    return ds_docs.select_columns([id_col, text_col]).map_batches(
        features, batch_format="pyarrow", zero_copy_batch=True
    )


def corpus_stats(
    feats: Dataset, n_terms: int, id_col: str = "doc_id"
) -> tuple[int, int, list[int]]:
    """(N, sum_dl, df per term) from the compact feature dataset via
    per-block sums + a driver reduce — O(blocks) rows on the driver,
    no HashAggregate actors. N and sum_dl come from the sentinel rows
    (every doc, matching or not, is counted there); df from the real
    rows (tf_j > 0)."""

    def block_totals(t: pa.Table) -> pa.Table:
        sent = pc.equal(t[id_col], -1)
        real = t.filter(pc.invert(sent))
        s = t.filter(sent)
        cols = {
            "n_docs": pa.array(
                [pc.sum(s["tf_0"]).as_py() or 0], pa.int64()
            ),
            "sum_dl": pa.array([pc.sum(s["dl"]).as_py() or 0], pa.int64()),
        }
        for j in range(n_terms):
            pos = pc.sum(
                pc.cast(pc.greater(real[f"tf_{j}"], 0), pa.int64())
            ).as_py()
            cols[f"df_{j}"] = pa.array([pos or 0], pa.int64())
        return pa.table(cols)

    totals = feats.map_batches(block_totals, batch_format="pyarrow").take_all()
    n_docs = sum(r["n_docs"] for r in totals)
    sum_dl = sum(r["sum_dl"] for r in totals)
    df = [sum(r[f"df_{j}"] for r in totals) for j in range(n_terms)]
    return n_docs, sum_dl, df


def bm25_topk(
    ds_docs: Dataset,
    terms: list[str],
    k: int = 25,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Top-k BM25 retrieval: (doc_id, dl, score_q) sorted by
    (score desc, doc_id). score_q is the score quantized to integer
    millionths — floor(score * 2^20 + 0.5) — so the driver-gate column
    stays BIGINT; the raw-double decision margins (adjacent-rank gaps
    and distance of score * 2^20 to the nearest rounding boundary) are
    measured and pytest-pinned (the kmeans float-parity pattern).

    ``terms`` must be non-empty (enforced in bm25_features).

    Term contributions are accumulated LEFT-TO-RIGHT in ``terms``
    order, matching the SQL oracle's explicit c0 + c1 + ... chain, so
    every double op has a cross-engine twin (ln() parity is asserted
    by the margin tests)."""
    import numpy as np

    feats = bm25_features(ds_docs, terms, id_col, text_col).materialize()
    n_docs, sum_dl, df = corpus_stats(feats, len(terms), id_col)
    if n_docs == 0:
        return feats.map_batches(
            lambda t: pa.schema(
                [
                    pa.field(id_col, pa.int64()),
                    pa.field("dl", pa.int64()),
                    pa.field("score_q", pa.int64()),
                ]
            ).empty_table(),
            batch_format="pyarrow",
        )
    avgdl = float(sum_dl) / float(n_docs)
    idf = [
        math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5)) for d in df
    ]

    out_schema = pa.schema(
        [
            pa.field(id_col, pa.int64()),
            pa.field("dl", pa.int64()),
            pa.field("score_q", pa.int64()),
        ]
    )

    def score_block(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t[id_col], 0))  # drop sentinels
        if t.num_rows == 0:
            return out_schema.empty_table()
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        # identical expression text in the SQL oracle: the float op
        # order (1 - b) + b * dl / avgdl, then + tf, is shared
        denom_base = (1.0 - b) + b * dl / avgdl
        score = np.zeros(len(dl), dtype=np.float64)
        for j in range(len(terms)):
            tf = t[f"tf_{j}"].to_numpy(zero_copy_only=False).astype(np.float64)
            score = score + idf[j] * (
                (tf * (k1 + 1.0)) / (tf + k1 * denom_base)
            )
        score_q = np.floor(score * 1048576.0 + 0.5).astype(np.int64)
        out = pa.table(
            {
                id_col: t[id_col],
                "dl": t["dl"],
                "score_q": pa.array(score_q),
            },
            schema=out_schema,
        )
        # per-block top-k prune: the global top-k survives any local one
        import polars as pl

        return (
            pl.from_arrow(out)
            .sort(["score_q", id_col], descending=[True, False])
            .head(k)
            .to_arrow()
            .cast(out_schema)
        )

    return (
        feats.map_batches(score_block, batch_format="pyarrow")
        .sort(["score_q", id_col], descending=[True, False])
        .limit(k)
    )


def bm25_margins(
    ds_docs: Dataset,
    terms: list[str],
    k: int = 25,
    k1: float = 1.2,
    b: float = 0.75,
) -> dict:
    """Measured float-safety margins for the score_q quantization and
    the top-k cut (pytest pins these against the ~1e-13 cross-engine
    double-expression error bound): min |score*2^20 - nearest 0.5
    boundary| over all scored docs, and the raw-score gap at the k-th
    rank.

    TEST-ONLY: this helper materializes the per-doc feature rows on
    the driver (``take_all``) to compute margins, so it must never be
    called on corpus-scale inputs — production scoring goes through
    ``bm25_topk`` (per-block top-k prune + limit). Sole caller:
    tests/test_pipelines_retrieval.py."""
    import numpy as np

    feats = bm25_features(ds_docs, terms).materialize()
    n_docs, sum_dl, df = corpus_stats(feats, len(terms))
    avgdl = float(sum_dl) / float(n_docs)
    idf = [math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5)) for d in df]
    rows = [r for r in feats.take_all() if r["doc_id"] >= 0]
    dl = np.array([r["dl"] for r in rows], dtype=np.float64)
    denom_base = (1.0 - b) + b * dl / avgdl
    score = np.zeros(len(dl))
    for j in range(len(terms)):
        tf = np.array([r[f"tf_{j}"] for r in rows], dtype=np.float64)
        score = score + idf[j] * ((tf * (k1 + 1.0)) / (tf + k1 * denom_base))
    scaled = score * 1048576.0
    frac = np.abs(scaled - np.floor(scaled) - 0.5)
    order = np.argsort(-score, kind="stable")
    srt = score[order]
    kth_gap = float(srt[k - 1] - srt[k]) if len(srt) > k else float("inf")
    return {
        "n_scored": int(len(score)),
        "min_boundary_dist": float(frac.min()) if len(frac) else float("inf"),
        "kth_gap": kth_gap,
    }


def inverted_index(
    ds_docs: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Inverted-index build: (word, df, postings) per distinct corpus
    term, postings = comma-joined doc ids ascending — the index a BM25
    /boolean retrieval service would serve from.

    Scale shape: per-batch DISTINCT (word, doc) partials kill token
    multiplicity in-batch; ONE word-aligned exchange (grouped_apply)
    lands every term's postings in one block, where a single polars
    group_by builds df + the sorted joined list — no per-term Python.
    Posting lists are inherently term-frequency-sized; at 100 TB a
    stopword's postings row is the corpus, so a production variant
    caps postings per term (df stays exact) — the cap is a LIMIT
    inside the block kernel, partitioning unchanged."""
    import polars as pl

    from textalyzer_ray.stages.groups import grouped_apply, key_counts
    from textalyzer_ray.stages.tokenize import _flat_tokens

    pair_schema = pa.schema(
        [pa.field("word", pa.string()), pa.field(id_col, pa.int64())]
    )

    def distinct_partial(t: pa.Table) -> pa.Table:
        import numpy as np

        tokens, parents = _flat_tokens(t, text_col)
        if len(tokens) == 0:
            return pair_schema.empty_table()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        df = pl.from_arrow(pa.table({"word": tokens, "par": parents})).unique()
        par = df["par"].to_numpy()
        return pa.table(
            {
                "word": df["word"].to_arrow(),
                id_col: pa.array(ids[par].astype(np.int64)),
            }
        ).cast(pair_schema)

    pairs = key_counts(
        ds_docs.select_columns([id_col, text_col]).map_batches(
            distinct_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["word", id_col],
    )

    out_schema = pa.schema(
        [
            pa.field("word", pa.string()),
            pa.field("df", pa.int64()),
            pa.field("postings", pa.string()),
        ]
    )

    def build_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        return (
            pl.from_arrow(t.select(["word", id_col]))
            .sort(["word", id_col])
            .group_by("word", maintain_order=True)
            .agg(
                pl.len().cast(pl.Int64).alias("df"),
                pl.col(id_col).cast(pl.String).str.join(",").alias("postings"),
            )
            .to_arrow()
            .cast(out_schema)
        )

    return grouped_apply(pairs, ["word"], build_block).sort("word")


def phrase_search(
    ds_docs: Dataset,
    phrases: list[list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Exact phrase search: every occurrence of each token phrase in
    the corpus as (phrase_id, doc_id, pos) — pos is the 1-based token
    position of the phrase's first word within the doc's non-empty
    token sequence (standard positional-postings phrase semantics:
    adjacency AFTER empty-token removal, the reference tokenizer's
    sequence, frequency.rs:34-45).

    Scale shape: ZERO shuffle — the phrase list is tiny and rides the
    batch closure; tokens are doc-major within a batch so phrase
    adjacency is adjacency in the flat token array (guarded by a
    same-doc check), and matching is all-numpy: one unique/inverse
    pass maps the batch's tokens to dense ids, each phrase word
    becomes one integer comparison over shifted slices. Output is
    ~occurrence-count rows; only the final deterministic sort touches
    them. Reference analogue: none; §2.9 extension surface.
    """
    if not phrases or any(not p for p in phrases):
        raise ValueError("phrases must be a non-empty list of non-empty lists")
    import numpy as np

    out_schema = pa.schema(
        [
            pa.field("phrase_id", pa.int64()),
            pa.field(id_col, pa.int64()),
            pa.field("pos", pa.int64()),
        ]
    )

    def match_batch(t: pa.Table) -> pa.Table:
        import numpy as np

        if t.num_rows == 0:
            return out_schema.empty_table()
        tokens, parents = _flat_tokens(t, text_col)
        ntok = len(tokens)
        if ntok == 0:
            return out_schema.empty_table()
        toks = tokens.to_numpy(zero_copy_only=False)
        par = parents.to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.arange(ntok, dtype=np.int64)
        change = np.r_[True, par[1:] != par[:-1]]
        seg_start = np.maximum.accumulate(np.where(change, idx, 0))
        pos_in_doc = idx - seg_start + 1  # 1-based
        uniq, inv = np.unique(toks, return_inverse=True)
        doc_ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols_pid, cols_doc, cols_pos = [], [], []
        for pid, words in enumerate(phrases):
            k = len(words)
            if ntok < k:
                continue
            wixs = np.searchsorted(uniq, np.array(words, dtype=object))
            if any(
                w >= len(uniq) or uniq[w] != words[j]
                for j, w in enumerate(wixs)
            ):
                continue  # a phrase word absent from this batch
            n_start = ntok - k + 1
            hit = inv[:n_start] == wixs[0]
            for j in range(1, k):
                hit = hit & (inv[j : n_start + j] == wixs[j])
            # same-doc guard: first and last phrase token share a parent
            hit = hit & (par[:n_start] == par[k - 1 : n_start + k - 1])
            at = np.flatnonzero(hit)
            if len(at):
                cols_pid.append(np.full(len(at), pid, np.int64))
                cols_doc.append(doc_ids[par[at]])
                cols_pos.append(pos_in_doc[at])
        if not cols_pid:
            return out_schema.empty_table()
        return pa.table(
            {
                "phrase_id": np.concatenate(cols_pid),
                id_col: np.concatenate(cols_doc),
                "pos": np.concatenate(cols_pos),
            },
            schema=out_schema,
        )

    return ds_docs.map_batches(
        match_batch, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["phrase_id", id_col, "pos"])
