"""JSONL source + compression-ratio signal."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

pytestmark = pytest.mark.usefixtures("quiet_data_context")


def test_jsonl_roundtrip(tmp_path):
    from textalyzer_ray.sources.tables import read_jsonl, write_jsonl_shards

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    n = write_jsonl_shards(str(tmp_path), docs, n_shards=3)
    assert n == docs.num_rows
    ds = read_jsonl(str(tmp_path), columns=["doc_id", "text"])
    got = sorted(
        ((r["doc_id"], r["text"]) for r in ds.take_all())
    )
    exp = sorted(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    assert got == exp


def test_compression_ratio_matches_zlib():
    import zlib

    from textalyzer_ray.pipelines.analytics import compression_ratio

    texts = ["abc " * 50, "x", "", "the quick brown fox jumps"]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": texts,
            }
        )
    )
    rows = compression_ratio(ds).take_all()
    for r, s in zip(rows, texts):
        b = s.encode()
        assert r["n_bytes"] == len(b)
        assert r["n_compressed"] == len(zlib.compress(b, 6))
        assert r["ratio_bp"] == ((r["n_compressed"] * 10000) // len(b) if b else 0)
    # repetitive text compresses far better than prose
    assert rows[0]["ratio_bp"] < rows[3]["ratio_bp"]
