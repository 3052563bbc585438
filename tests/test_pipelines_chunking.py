"""Sliding-window chunking: brute-force equivalence + edge cases."""

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.pipelines.chunking import chunk_windows

pytestmark = pytest.mark.usefixtures("quiet_data_context")


def brute(texts, size, stride):
    rows = []
    for i, t in enumerate(texts):
        ws = t.split(" ")
        n = len(ws)
        n_chunks = -(-max(n - size, 0) // stride) + 1
        for k in range(n_chunks):
            win = ws[k * stride : k * stride + size]
            rows.append(
                {
                    "doc_id": i,
                    "chunk_id": k,
                    "n_words": len(win),
                    "chunk_text": " ".join(win),
                }
            )
    return rows


TEXTS = [
    " ".join(f"w{i}" for i in range(n))
    for n in (1, 3, 4, 5, 7, 8, 9, 12, 40)
] + ["", "single", "a  b"]  # '' splits to [''], double space keeps ''


class TestChunkWindows:
    @pytest.mark.parametrize("size,stride", [(4, 3), (4, 4), (8, 2), (32, 24)])
    def test_matches_brute_force(self, size, stride):
        t = pa.table({"doc_id": list(range(len(TEXTS))), "text": TEXTS})
        got = (
            chunk_windows(rd.from_arrow(t).repartition(4), size, stride)
            .sort(["doc_id", "chunk_id"])
            .take_all()
        )
        assert got == brute(TEXTS, size, stride)

    def test_short_tail_never_empty(self):
        t = pa.table({"doc_id": [0], "text": [" ".join("x" * 1 for _ in range(9))]})
        rows = chunk_windows(rd.from_arrow(t), 4, 3).take_all()
        assert all(r["n_words"] >= 1 for r in rows)
        # coverage: every word index appears in some window
        seen = set()
        for r in rows:
            start = r["chunk_id"] * 3
            seen.update(range(start, start + r["n_words"]))
        assert seen == set(range(9))

    def test_bad_stride_raises(self):
        t = rd.from_arrow(pa.table({"doc_id": [0], "text": ["a"]}))
        with pytest.raises(ValueError):
            chunk_windows(t, 4, 5)
        with pytest.raises(ValueError):
            chunk_windows(t, 4, 0)

    def test_empty_dataset(self):
        t = pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
        )
        assert chunk_windows(rd.from_arrow(t)).take_all() == []


from hypothesis import given, settings
from hypothesis import strategies as st


class TestChunkWindowsProperty:
    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.text(alphabet="abxyz", min_size=0, max_size=3),
                min_size=0,
                max_size=30,
            ).map(lambda ws: " ".join(ws)),
            min_size=1,
            max_size=6,
        ),
        st.integers(min_value=1, max_value=9),
        st.integers(min_value=1, max_value=9),
    )
    def test_brute_equality_random(self, texts, size, stride):
        import pyarrow as pa
        import ray.data as rd

        if stride > size:
            size, stride = stride, size
        t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        got = (
            chunk_windows(rd.from_arrow(t).repartition(2), size, stride)
            .sort(["doc_id", "chunk_id"])
            .take_all()
        )
        assert got == brute(texts, size, stride)
