"""Content-defined chunking: batched boundary scan pinned to a scalar
reference (hypothesis, including doc-straddle masking), the
reassembly invariant (chunks concat back to the text), the CDC
shift-robustness property, and DuckDB oracle equality at sf0.001."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from textalyzer_ray.core.fingerprint import _POLY_B, _POLY_C
from textalyzer_ray.pipelines.cdc import (
    batch_boundaries,
    cdc_duplicate_chunks,
    chunk_rows,
)

pytestmark = pytest.mark.usefixtures("quiet_data_context")

SF = "/root/testdata/sf0.001"
W, K, R = 16, 5, 7


def scalar_boundaries(b: bytes) -> list[int]:
    """Per-doc scalar reference for the window scan."""
    out = []
    for i in range(W - 1, len(b)):
        h = 0
        for byte in b[i - W + 1 : i + 1]:
            h = (h * _POLY_B + byte) % (1 << 64)
        m = (h * _POLY_C) % (1 << 64)
        hi, lo = m >> 32, (m & 0xFFFFFFFF) ^ (m >> 32)
        if (lo & ((1 << K) - 1)) == R:
            out.append(i)
    return out


@given(st.lists(st.binary(min_size=0, max_size=120), min_size=1, max_size=6))
@settings(max_examples=40, deadline=None)
def test_batched_scan_matches_scalar(texts):
    starts, ends = batch_boundaries(texts, W, K, R)
    exp = []
    off = 0
    for t in texts:
        exp.extend(off + i for i in scalar_boundaries(t))
        off += len(t)
    assert ends.tolist() == exp
    assert starts.tolist() == np.concatenate(
        [[0], np.cumsum([len(t) for t in texts])]
    ).tolist()


def _chunks_of(text: str) -> list[str]:
    t = pa.table({"doc_id": [0], "text": [text]})
    rows = chunk_rows(t, "doc_id", "text", W, K, R)
    # chunk_rows pre-aggregates; rebuild multiset from occ
    out = []
    for c, n in zip(rows["chunk"].to_pylist(), rows["occ"].to_pylist()):
        out.extend([c] * n)
    return out


def test_reassembly_invariant_real_docs():
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT text FROM '{SF}/documents.parquet' LIMIT 50"
    ).fetchall()
    for (text,) in rows:
        chunks = _chunks_of(text)
        assert sorted("".join(chunks)) == sorted(text)
        # ordered reassembly via the raw boundary scan
        starts, ends = batch_boundaries([text.encode()], W, K, R)
        cur, parts = 0, []
        for e in ends.tolist():
            parts.append(text[cur : e + 1])
            cur = e + 1
        if cur < len(text):
            parts.append(text[cur:])
        assert "".join(parts) == text


def test_content_defined_shift_robustness():
    # a shared passage yields identical interior chunks regardless of
    # the byte offset it sits at — the property fixed-size blocking
    # lacks
    passage = "the quick brown fox jumps over the lazy dog " * 8
    a = "PREFIX-A " + passage + " TAIL-A"
    b = "a totally different and much longer prefix here " + passage
    ca, cb = set(_chunks_of(a)), set(_chunks_of(b))
    shared = {c for c in ca & cb if c in passage}
    assert shared, "no interior chunk survived the shift"


def test_empty_and_short_docs():
    t = pa.table({"doc_id": [1, 2, 3], "text": ["", "tiny", "x" * 15]})
    rows = chunk_rows(t, "doc_id", "text", W, K, R)
    # no doc reaches the window size: each non-empty doc is one chunk
    assert sorted(rows["chunk"].to_pylist()) == ["tiny", "x" * 15]


def test_non_ascii_rejected():
    t = pa.table({"doc_id": [1], "text": ["héllo world padding padding"]})
    with pytest.raises(ValueError, match="non-ASCII"):
        chunk_rows(t, "doc_id", "text", W, K, R)


def test_duplicate_groups_and_oracle_sf0001():
    import duckdb

    import __ray_entry__ as entry

    got = entry._q_cdc_chunks(SF).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = con.sql(entry.oracle_sql()["cdc_chunks"]).df()
    assert got.columns.tolist() == ["chunk", "n_docs", "n_occ"]
    assert len(got) == len(exp) > 0
    assert got.equals(exp)


def test_within_doc_occurrences_counted():
    rep = "zz repeated passage body marker " * 6
    t = pa.table({"doc_id": [7], "text": [rep]})
    ds = rd.from_arrow(t)
    out = cdc_duplicate_chunks(ds).to_pandas()
    if len(out):  # boundaries may or may not repeat — invariant only
        assert (out["n_docs"] == 1).all()
        assert (out["n_occ"] >= 2).all()
