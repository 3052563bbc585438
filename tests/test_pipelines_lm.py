"""Bigram-LM surprisal: scalar/vector parity, train/score pipeline."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from textalyzer_ray.core.lm import (
    avg_bits,
    bitlen_array,
    doc_surprisal,
    surprisal_bits,
    train_counts,
)
from textalyzer_ray.pipelines.lm import lm_surprisal_scores, lm_train

pytestmark = pytest.mark.usefixtures("quiet_data_context")


def test_bitlen_array_exact_incl_powers_of_two():
    xs = np.array(
        [0, 1, 2, 3, 4, 7, 8, 1023, 1024, 1025, (1 << 52) - 1, 1 << 52],
        dtype=np.int64,
    )
    assert bitlen_array(xs).tolist() == [int(x).bit_length() for x in xs]


def test_surprisal_bits_matches_log2_within_one_bit():
    import math

    for c1, c2, v in [(10, 3, 5), (100, 0, 7), (0, 0, 3), (1 << 20, 1 << 10, 9)]:
        got = surprisal_bits(c1, c2, v)
        true = math.log2((c1 + v) / (c2 + 1))
        assert abs(got - true) <= 1.0


# İ/Σ exercise the full-lowercase divergence path; digits/punct split.
_alphabet = "abğcİΣ0 .!\n-"


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.text(alphabet=_alphabet, max_size=25), max_size=5),
    st.lists(st.text(alphabet=_alphabet, max_size=25), min_size=1, max_size=4),
)
def test_vectorized_scoring_matches_scalar(texts, slice_texts):
    from textalyzer_ray.pipelines.lm import _bigram_rows
    import polars as pl

    c1, c2, v = train_counts(slice_texts)
    c1f = pl.DataFrame(
        {"w1": list(c1) or pl.Series([], dtype=pl.String), "c1": list(c1.values())},
        schema={"w1": pl.String, "c1": pl.Int64},
    )
    c2f = pl.DataFrame(
        {
            "w1": [k[0] for k in c2],
            "w2": [k[1] for k in c2],
            "c2": list(c2.values()),
        },
        schema={"w1": pl.String, "w2": pl.String, "c2": pl.Int64},
    )
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    big = _bigram_rows(t, "text")
    nbi = np.zeros(len(texts), np.int64)
    tot = np.zeros(len(texts), np.int64)
    if len(big):
        from textalyzer_ray.core.lm import bitlen_array as bl

        big = big.join(c1f, on="w1", how="left").join(
            c2f, on=["w1", "w2"], how="left"
        )
        c1v = big["c1"].fill_null(0).to_numpy().astype(np.int64)
        c2v = big["c2"].fill_null(0).to_numpy().astype(np.int64)
        bits = bl(c1v + v) - bl(c2v + 1)
        par = big["doc"].to_numpy().astype(np.int64)
        np.add.at(nbi, par, 1)
        np.add.at(tot, par, bits)
    for i, txt in enumerate(texts):
        n_ref, t_ref = doc_surprisal(txt, c1, c2, v)
        assert (nbi[i], tot[i]) == (n_ref, t_ref)


class TestLmPipeline:
    def _corpus(self):
        texts = [
            "the cat sat on the mat",
            "the cat ran off the mat",
            "dogs chase the cat around",
            "zzz qqq xxx yyy www vvv",  # fully out-of-model
            "single",
            "",
        ]
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        ), texts

    def test_end_to_end_matches_scalar_reference(self, ray_session):
        ds, texts = self._corpus()
        slice_texts = [texts[0], texts[2]]
        slice_ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 2], pa.int64()),
                    "text": pa.array(slice_texts, pa.string()),
                }
            )
        )
        rows = {
            r["doc_id"]: r
            for r in lm_surprisal_scores(ds, slice_ds).take_all()
        }
        c1, c2, v = train_counts(slice_texts)
        for i, txt in enumerate(texts):
            n_ref, t_ref = doc_surprisal(txt, c1, c2, v)
            assert rows[i]["n_bigrams"] == n_ref
            assert rows[i]["total_bits"] == t_ref
            assert rows[i]["avg_bits"] == avg_bits(t_ref, n_ref)
        # in-model docs score lower than the out-of-model doc
        assert rows[0]["avg_bits"] < rows[3]["avg_bits"]

    def test_train_counts_pipeline_matches_scalar(self, ray_session):
        _, texts = self._corpus()
        slice_ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )
        c1f, c2f, v = lm_train(slice_ds)
        c1, c2, v_ref = train_counts(texts)
        assert v == v_ref
        assert dict(zip(c1f["w1"], c1f["c1"])) == c1
        got2 = {
            (a, b): n for a, b, n in zip(c2f["w1"], c2f["w2"], c2f["c2"])
        }
        assert got2 == c2

    def test_empty_slice_model(self, ray_session):
        ds, _ = self._corpus()
        empty = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                }
            )
        )
        rows = lm_surprisal_scores(ds, empty).take_all()
        # v = 0, all counts 0: bits = bitlen(0) - bitlen(1) = -1 per bigram
        by_id = {r["doc_id"]: r for r in rows}
        assert by_id[0]["total_bits"] == -by_id[0]["n_bigrams"]
