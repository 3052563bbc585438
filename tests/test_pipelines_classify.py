"""Hashed-linear classifier: scalar/vector parity, pipeline semantics."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from textalyzer_ray.core.classify import (
    HASH_DIM,
    classify_text,
    hashed_weights,
    score_of,
)
from textalyzer_ray.pipelines.classify import classifier_scores, infer_batch

pytestmark = pytest.mark.usefixtures("quiet_data_context")

_W = hashed_weights()


def test_weights_deterministic_and_bounded():
    w = hashed_weights()
    assert w.dtype == np.int64 and w.shape == (HASH_DIM,)
    assert w.min() >= -1000 and w.max() <= 1000
    assert np.array_equal(w, _W)
    # not degenerate: both signs well represented
    assert (w > 0).sum() > HASH_DIM // 4 and (w < 0).sum() > HASH_DIM // 4


# İ/Σ exercise the full-lowercase divergence path; digits/punct split.
_alphabet = "abğcİΣ0 .!\n-"


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet=_alphabet, max_size=20), max_size=5))
def test_batch_matches_scalar_reference(texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = infer_batch(t, _W)
    assert out.column_names == ["doc_id", "n_tokens", "logit", "score", "keep"]
    for i, txt in enumerate(texts):
        nt, lg = classify_text(txt, _W)
        assert out["n_tokens"][i].as_py() == nt
        assert out["logit"][i].as_py() == lg
        assert out["score"][i].as_py() == score_of(lg, nt)
        assert out["keep"][i].as_py() == (1 if lg > 0 else 0)


def test_pipeline_broadcast_inference(ray_session):
    texts = [f"doc number {i} with shared words and tail{i}" for i in range(40)]
    texts.append("")  # zero-token doc
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(5)
    got = classifier_scores(ds).sort("doc_id").take_all()
    assert len(got) == len(texts)
    for r in got:
        nt, lg = classify_text(texts[r["doc_id"]], _W)
        assert (r["n_tokens"], r["logit"]) == (nt, lg)
        assert r["score"] == score_of(lg, nt)
    empty = got[-1]
    assert (empty["n_tokens"], empty["logit"], empty["score"], empty["keep"]) == (
        0,
        0,
        0.0,
        0,
    )


def test_custom_weights_swap_in(ray_session):
    # A "trained model" (all-positive weights) keeps everything.
    w = np.ones(HASH_DIM, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": ["some words here", "more text"],
            }
        )
    )
    got = classifier_scores(ds, weights=w).sort("doc_id").take_all()
    assert [r["keep"] for r in got] == [1, 1]
    assert [r["logit"] for r in got] == [3, 2]
    with pytest.raises(ValueError):
        classifier_scores(ds, weights=np.ones(3, dtype=np.int64))
