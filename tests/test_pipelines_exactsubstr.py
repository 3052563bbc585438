"""Byte-level ExactSubstr spans: pipeline pinned to the SUFFIX-ARRAY
reference (core/exactsubstr.py) on planted + random corpora, rolling
hash identity, cross-path (broadcast vs distributed) equality, edge
cases, and DuckDB oracle equality at sf0.001."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from textalyzer_ray.core.exactsubstr import (
    _B,
    reference_spans,
    window_hashes,
)
from textalyzer_ray.pipelines.exactsubstr import exact_substr_spans

pytestmark = pytest.mark.usefixtures("quiet_data_context")

SF = "/root/testdata/sf0.001"


def run(texts: dict[int, bytes], min_len: int, **kw):
    t = pa.table(
        {
            "doc_id": list(texts),
            "text": [v.decode("utf-8") for v in texts.values()],
        }
    )
    got = exact_substr_spans(
        rd.from_arrow(t).repartition(3), min_len=min_len, **kw
    ).take_all()
    return [(r["doc_id"], r["span_start"], r["span_end"]) for r in got]


@given(st.binary(min_size=0, max_size=200), st.integers(2, 8))
@settings(max_examples=60, deadline=None)
def test_rolling_hash_identity(data, min_len):
    # the prefix-trick hash equals the direct Horner evaluation
    buf = np.frombuffer(data, np.uint8)
    n_w = max(0, len(buf) - min_len + 1)
    starts = np.arange(n_w, dtype=np.int64)
    got = window_hashes(buf, starts, min_len)
    b = np.uint64(_B)
    with np.errstate(over="ignore"):
        for s in range(n_w):
            v = np.uint64(0)
            for j in range(min_len):
                v = v * b + np.uint64(buf[s + j])
            assert got[s] == v


def test_planted_spans():
    shared = b"the quick brown fox jumps over the lazy dog again and again"
    texts = {
        0: b"unique prefix zero " + shared + b" unique suffix zero",
        1: b"totally different start " + shared + b" other end",
        2: b"selfrepeat " + b"abcdefghijklmnop0123456789zyxwvu" * 2 + b"t",
        3: b"no duplication here at all just original content",
        4: b"short",
    }
    got = run(texts, 30)
    assert got == reference_spans(texts, 30)
    # the cross-doc shared paragraph is found in both docs, the
    # self-repeat in doc 2, nothing in 3/4
    assert {d for d, _, _ in got} == {0, 1, 2}
    # doc 0's span covers exactly the shared bytes — including the
    # flanking spaces, which both docs share too (maximal, byte-exact)
    d0 = [s for s in got if s[0] == 0][0]
    assert texts[0][d0[1] : d0[2]] == b" " + shared + b" "


def test_boundary_exactly_min_len():
    # a dup of EXACTLY min_len bytes is found; min_len-1 is not
    frag = b"0123456789abcdefghij"  # 20 bytes
    texts = {0: b"xx" + frag + b"yy", 1: b"aa" + frag + b"bb"}
    assert run(texts, 20) == [(0, 2, 22), (1, 2, 22)]
    texts2 = {0: b"xx" + frag[:19] + b"yy", 1: b"aa" + frag[:19] + b"bb"}
    assert run(texts2, 20) == []


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_random_corpora_match_suffix_array_reference(seed):
    rng = random.Random(seed)
    texts = {}
    frag = bytes(rng.randrange(97, 123) for _ in range(70))
    for d in range(15):
        body = bytes(rng.randrange(97, 123) for _ in range(rng.randrange(0, 160)))
        ins = rng.randrange(0, len(body) + 1)
        if d % 3 == 0:
            body = body[:ins] + frag + body[ins:]
        texts[d] = body
    assert run(texts, 25) == reference_spans(texts, 25)


def test_cross_path_equality():
    # broadcast vs distributed (union-tag) candidate paths are equal
    rng = random.Random(9)
    frag = bytes(rng.randrange(97, 123) for _ in range(60))
    texts = {
        d: bytes(rng.randrange(97, 123) for _ in range(80))
        + (frag if d % 2 == 0 else b"")
        for d in range(10)
    }
    a = run(texts, 30)
    b = run(texts, 30, broadcast_threshold=0)
    assert a == b == reference_spans(texts, 30)
    assert len(a) > 0


def test_rejects_tiny_min_len_and_empty():
    with pytest.raises(ValueError):
        run({0: b"abc"}, 1)
    assert run({0: b"", 1: b"x"}, 5) == []


def test_oracle_equality_sf0001():
    import duckdb

    import __ray_entry__ as entry

    got = entry._q_exact_substr_spans(SF).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = con.sql(entry.oracle_sql()["exact_substr_spans"]).df()
    assert got.columns.tolist() == exp.columns.tolist()
    assert len(got) == len(exp) > 0
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))


def test_cast_table_chunked_slices_oversized_binary():
    # r5 soak finding: polars emits single-chunk large_binary and Arrow
    # cannot cast a chunk past int32 offsets into binary — the helper
    # row-slices along the offsets buffer (tiny limit stands in for the
    # 2 GiB boundary)
    from textalyzer_ray.stages.groups import cast_table_chunked

    vals = [b"x" * 10, b"y" * 25, None, b"z" * 5, b"w" * 40, b""]
    t = pa.table(
        {
            "id": pa.array(range(6), pa.int64()),
            "blob": pa.array(vals, pa.large_binary()),
        }
    )
    schema = pa.schema(
        [pa.field("id", pa.int64()), pa.field("blob", pa.binary())]
    )
    out = cast_table_chunked(t, schema, limit=16)
    assert out.schema == schema
    assert out["blob"].to_pylist() == vals
    assert out["blob"].num_chunks > 1
    # sliced (offset != 0) inputs and the fast no-slice path
    sl = pa.table({"id": t["id"].slice(1, 4), "blob": t["blob"].slice(1, 4)})
    assert cast_table_chunked(sl, schema, limit=16)["blob"].to_pylist() == vals[1:5]
    assert cast_table_chunked(t, schema)["blob"].num_chunks == 1


def test_removal_rebuild_matches_reference_spans():
    # removal == cut every reference span out of the text, in order
    from textalyzer_ray.pipelines.exactsubstr import exact_substr_removal

    rng = random.Random(21)
    frag = bytes(rng.randrange(97, 123) for _ in range(60))
    texts = {
        d: bytes(rng.randrange(97, 123) for _ in range(rng.randrange(20, 120)))
        + (frag if d % 2 == 0 else b"")
        for d in range(12)
    }
    t = pa.table(
        {
            "doc_id": list(texts),
            "text": [v.decode() for v in texts.values()],
        }
    )
    got = exact_substr_removal(
        rd.from_arrow(t).repartition(3), min_len=30
    ).take_all()
    spans_by_doc: dict[int, list] = {}
    for d, s, e in reference_spans(texts, 30):
        spans_by_doc.setdefault(d, []).append((s, e))
    assert len(got) == len(texts)
    for r in got:
        buf = texts[r["doc_id"]]
        kept = bytearray()
        prev = 0
        for s, e in spans_by_doc.get(r["doc_id"], []):
            kept += buf[prev:s]
            prev = e
        kept += buf[prev:]
        assert r["n_bytes"] == len(buf)
        assert r["kept_text"].encode() == bytes(kept)
        assert r["removed_bytes"] == len(buf) - len(kept)


def test_removal_full_and_none():
    from textalyzer_ray.pipelines.exactsubstr import exact_substr_removal

    # two identical docs: everything removed; one unique doc: untouched
    texts = {0: b"a" * 50, 1: b"a" * 50, 2: b"totally unique content here x"}
    t = pa.table(
        {"doc_id": [0, 1, 2], "text": [v.decode() for v in texts.values()]}
    )
    got = {
        r["doc_id"]: (r["removed_bytes"], r["kept_text"])
        for r in exact_substr_removal(
            rd.from_arrow(t).repartition(2), min_len=40
        ).take_all()
    }
    assert got[0] == (50, "") and got[1] == (50, "")
    assert got[2] == (0, texts[2].decode())


def test_removal_oracle_equality_sf0001():
    import duckdb

    import __ray_entry__ as entry

    got = entry._q_exact_substr_removal(SF).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = con.sql(entry.oracle_sql()["exact_substr_removal"]).df()
    assert got.columns.tolist() == exp.columns.tolist()
    assert len(got) == len(exp) > 0
    assert (got["removed_bytes"] > 0).any()
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))
