"""Bigram-LM surprisal scoring — the CCNet perplexity-filter shape.

Two stages, both the broadcast-model pattern of
``pipelines/classify.py``:

- **train** (over the reference slice): unigram and bigram counts via
  ``stages.groups.key_counts`` (partial-combine then auto-sized merge),
  collected into two polars frames + the vocabulary size. The model is
  a TRAINING ARTIFACT — like classifier weights it is fixed-size by
  design (CCNet's KenLM is ~4 GB regardless of corpus size), so
  broadcast-once (``ray.put``) is the 100 TB shape; were a
  corpus-derived unbounded table ever used instead, the named fallback
  is the tfidf hash-partitioned join (pipelines/frequency.py). Model
  rows are logged so an oversized model is visible, not silent.
- **score** (over every document): ONE zero-shuffle ``map_batches`` —
  tokenize (Arrow kernels), in-block bigram explosion (polars
  shift-over-doc), two left joins against the cached model frames,
  vectorized integer bitlen math, in-block per-doc aggregation (each
  document's text lives in one row, so per-doc sums never cross
  blocks). No text leaves the stage; output is four scalar columns.

Exact semantics (bitlen quantization, smoothing, tie-free means) live
in :mod:`textalyzer_ray.core.lm` and are SQL-recomputable — the driver
oracle retrains the same counts and replays the scoring in DuckDB.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from textalyzer_ray.core.lm import bitlen_array
from textalyzer_ray.stages.groups import _worker_object_cache, key_counts
from textalyzer_ray.stages.tokenize import _flat_tokens

logger = logging.getLogger(__name__)


def _bigram_rows(t: pa.Table, text_col: str) -> "pl.DataFrame":
    import polars as pl

    tokens, parents = _flat_tokens(t, text_col)
    df = pl.from_arrow(
        pa.table({"doc": pa.array(parents.to_numpy(zero_copy_only=False)), "w1": tokens})
    ).cast({"w1": pl.String, "doc": pl.Int64})
    return df.with_columns(
        pl.col("w1").shift(-1).over("doc").alias("w2")
    ).drop_nulls("w2")


def lm_train(
    slice_ds: Dataset, text_col: str = "text"
) -> tuple["pl.DataFrame", "pl.DataFrame", int]:
    """Count model over the reference slice -> (c1 frame [w1, c1],
    c2 frame [w1, w2, c2], V). Distributed partial counts, auto-sized
    merge (key_counts); the finished model lands on the driver because
    it IS the broadcast artifact."""
    import polars as pl

    def uni_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tokens, _ = _flat_tokens(t, text_col)
        vc = pc.value_counts(tokens)
        return pa.table(
            {"w1": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    def bi_partial(t: pa.Table) -> pa.Table:
        import polars as pl

        df = (
            _bigram_rows(t, text_col)
            .group_by(["w1", "w2"])
            .len()
            .with_columns(pl.col("len").cast(pl.Int64).alias("n"))
        )
        return df.select(["w1", "w2", "n"]).to_arrow().cast(
            pa.schema(
                [
                    pa.field("w1", pa.string()),
                    pa.field("w2", pa.string()),
                    pa.field("n", pa.int64()),
                ]
            )
        )

    uni = key_counts(
        slice_ds.map_batches(uni_partial, batch_format="pyarrow"),
        ["w1"],
        sum_cols=["n"],
    )
    bi = key_counts(
        slice_ds.map_batches(bi_partial, batch_format="pyarrow"),
        ["w1", "w2"],
        sum_cols=["n"],
    )
    # collect each merge ONCE (a count() guard would re-execute the
    # merge lineage); empty models fall back to typed empty frames
    uni_b = list(uni.iter_batches(batch_size=None, batch_format="pyarrow"))
    bi_b = list(bi.iter_batches(batch_size=None, batch_format="pyarrow"))
    c1 = (
        pl.from_arrow(pa.concat_tables(uni_b)).select(
            [pl.col("w1").cast(pl.String), pl.col("sum_n").alias("c1")]
        )
        if uni_b
        else pl.DataFrame(
            {"w1": pl.Series([], dtype=pl.String), "c1": pl.Series([], dtype=pl.Int64)}
        )
    )
    c2 = (
        pl.from_arrow(pa.concat_tables(bi_b)).select(
            [
                pl.col("w1").cast(pl.String),
                pl.col("w2").cast(pl.String),
                pl.col("sum_n").alias("c2"),
            ]
        )
        if bi_b
        else pl.DataFrame(
            {
                "w1": pl.Series([], dtype=pl.String),
                "w2": pl.Series([], dtype=pl.String),
                "c2": pl.Series([], dtype=pl.Int64),
            }
        )
    )
    logger.info("lm_train: model %d unigrams, %d bigrams", len(c1), len(c2))
    return c1, c2, len(c1)


def lm_surprisal_scores(
    docs: Dataset,
    slice_ds: Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Score every document of ``docs`` against the bigram model trained
    on ``slice_ds`` -> (id, n_bigrams, total_bits, avg_bits). avg_bits
    is mean integer surprisal in bits/token — log2 perplexity up to the
    bitlen quantization; high = unlike the reference slice."""
    import polars as pl

    c1_df, c2_df, v = lm_train(slice_ds, text_col=text_col)
    model_ref = ray.put((c1_df.to_arrow(), c2_df.to_arrow(), v))

    out_fields = [
        ("n_bigrams", pa.int64()),
        ("total_bits", pa.int64()),
        ("avg_bits", pa.float64()),
    ]

    def score(t: pa.Table) -> pa.Table:
        import polars as pl

        cache = _worker_object_cache()
        ck = "lm-" + model_ref.hex()
        model = cache.get(ck)
        if model is None:
            c1_t, c2_t, vv = ray.get(model_ref)
            model = cache[ck] = (pl.from_arrow(c1_t), pl.from_arrow(c2_t), vv)
        c1f, c2f, vv = model
        n = t.num_rows
        nbi = np.zeros(n, np.int64)
        tot = np.zeros(n, np.int64)
        big = _bigram_rows(t, text_col)
        if len(big):
            big = big.join(c1f, on="w1", how="left").join(
                c2f, on=["w1", "w2"], how="left"
            )
            c1v = big["c1"].fill_null(0).to_numpy().astype(np.int64)
            c2v = big["c2"].fill_null(0).to_numpy().astype(np.int64)
            bits = bitlen_array(c1v + vv) - bitlen_array(c2v + 1)
            par = big["doc"].to_numpy().astype(np.int64)
            np.add.at(nbi, par, 1)
            np.add.at(tot, par, bits)
        avg = np.where(nbi > 0, tot / np.maximum(nbi, 1), 0.0)
        return pa.table(
            {
                id_col: t[id_col],
                "n_bigrams": pa.array(nbi),
                "total_bits": pa.array(tot),
                "avg_bits": pa.array(avg, pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")
