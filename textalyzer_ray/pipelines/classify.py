"""Model-inference pipeline: hashed-linear quality classifier scores.

The broadcast-weights inference shape every learned filter needs at
100 TB: the model (a numpy weight vector) is ``ray.put`` ONCE on the
driver, each worker process deserializes it once via the per-worker
object cache (stages/groups.py pattern — tasks, not an actor pool, per
the CLAUDE.md join-deadlock note), and per-batch inference is fully
vectorized: Arrow tokenize -> dictionary-encode -> hash UNIQUE tokens
(``polyhash64_array``, one multiply-add per byte column) -> weight
gather -> per-doc ``np.add.at`` segment sum. No text leaves the stage;
the output is five scalar columns per document.

A trained model (fastText / logistic regression over hashed bags) drops
in by passing ``weights=`` — the plumbing (broadcast, cache, gather,
pooling) is exactly what real inference uses; the deterministic
``hashed_weights`` default is what makes the stage SQL-oracle-able
(core/classify.py).

Scale: embarrassingly parallel map_batches over a task pool — no
shuffle, no driver materialization; the broadcast is O(dim) regardless
of corpus size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from textalyzer_ray.core.classify import (
    HASH_DIM,
    WEIGHT_SCALE,
    hashed_weights,
)
from textalyzer_ray.core.fingerprint import polyhash64_array
from textalyzer_ray.stages.groups import _worker_object_cache
from textalyzer_ray.stages.tokenize import _flat_tokens


def infer_batch(
    t: pa.Table,
    weights: np.ndarray,
    dim: int = HASH_DIM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Pure vectorized inference over one Arrow batch — bit-equal to
    core.classify.classify_text per row (hypothesis-pinned)."""
    tokens, parents = _flat_tokens(t, text_col)
    n = t.num_rows
    ntok = np.zeros(n, np.int64)
    logit = np.zeros(n, np.int64)
    if len(tokens):
        enc = tokens.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        hu = polyhash64_array(uniq)
        wt = weights[(hu % np.uint64(dim)).astype(np.int64)]
        idx = enc.indices.to_numpy(zero_copy_only=False)
        par = parents.to_numpy(zero_copy_only=False)
        np.add.at(ntok, par, 1)
        np.add.at(logit, par, wt[idx])
    # int64/int64 -> one correctly-rounded double division, bit-equal to
    # DuckDB CAST(logit AS DOUBLE)/(1000*n); 0.0 for empty docs.
    score = np.where(ntok > 0, logit / np.maximum(WEIGHT_SCALE * ntok, 1), 0.0)
    return pa.table(
        {
            id_col: t[id_col],
            "n_tokens": pa.array(ntok),
            "logit": pa.array(logit),
            "score": pa.array(score),
            "keep": pa.array((logit > 0).astype(np.int64)),
        }
    )


def classifier_scores(
    docs: Dataset,
    *,
    dim: int = HASH_DIM,
    weights: np.ndarray | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Score every document with the hashed-linear classifier ->
    (id, n_tokens, logit, score, keep). ``keep`` is sign(logit) — an
    integer decision usable as a filter column without float
    comparisons."""
    import ray

    w = hashed_weights(dim) if weights is None else np.asarray(weights, np.int64)
    if w.shape != (dim,):
        raise ValueError(f"weights shape {w.shape} != ({dim},)")
    w_ref = ray.put(w)

    def infer(t: pa.Table) -> pa.Table:
        cache = _worker_object_cache()
        ck = "clf-" + (w_ref.hex() if hasattr(w_ref, "hex") else str(w_ref))
        wv = cache.get(ck)
        if wv is None:
            wv = cache[ck] = ray.get(w_ref)
        return infer_batch(t, wv, dim=dim, id_col=id_col, text_col=text_col)

    return docs.map_batches(infer, batch_format="pyarrow")
