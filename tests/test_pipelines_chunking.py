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


def brute_pack(ids, texts, L):
    """Pure-python packing reference over the same tokenizer."""
    from textalyzer_ray.core.textmetrics import tokenize

    stream = []
    for did, text in sorted(zip(ids, texts)):
        for tok in tokenize(text):
            stream.append((did, len(tok.encode()) + 1))
        stream.append((did, 1))
    seqs = {}
    for p, (did, v) in enumerate(stream):
        s, slot = p // L, p % L
        e = seqs.setdefault(
            s, dict(docs=set(), n=0, eos=0, lo=did, hi=did, c1=0, c2=0)
        )
        e["docs"].add(did)
        e["n"] += 1
        e["eos"] += v == 1
        e["lo"] = min(e["lo"], did)
        e["hi"] = max(e["hi"], did)
        e["c1"] += (slot + 1) * v
        e["c2"] += (slot + 1) ** 2 * v
    return [
        (s, len(e["docs"]), e["n"], e["eos"], e["lo"], e["hi"], e["c1"], e["c2"])
        for s, e in sorted(seqs.items())
    ]


class TestSequencePack:
    def as_tuples(self, rows):
        return [
            (
                r["seq_id"], r["n_docs"], r["n_slots"], r["n_eos"],
                r["first_doc"], r["last_doc"], r["cksum1"], r["cksum2"],
            )
            for r in rows
        ]

    def test_brute_force_and_partitioning(self):
        from textalyzer_ray.pipelines.chunking import sequence_pack

        ids = [10, 3, 7, 1, 5, 42, 8]
        texts = [
            "the quick brown fox", "", "a b c d e f g h i j",
            "one two, THREE!", "xxxxx yz", "m", "end of stream here",
        ]
        t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
        want = brute_pack(ids, texts, 4)
        for parts in (1, 3, 7):
            got = sequence_pack(
                rd.from_arrow(t).repartition(parts), seq_len=4
            ).take_all()
            assert self.as_tuples(got) == want

    def test_invariants_on_testdata(self):
        from textalyzer_ray.pipelines.chunking import sequence_pack
        from textalyzer_ray.sources.tables import read_table

        SF = "/root/testdata/sf0.001"
        L = 128
        docs = read_table(SF, "documents", columns=["doc_id", "text"])
        rows = sequence_pack(docs, seq_len=L).take_all()
        n_docs = read_table(SF, "documents", columns=["doc_id"]).count()
        # every sequence full except possibly the last; ids consecutive
        assert [r["seq_id"] for r in rows] == list(range(len(rows)))
        assert all(r["n_slots"] == L for r in rows[:-1])
        assert 1 <= rows[-1]["n_slots"] <= L
        # every doc's EOS lands exactly once
        assert sum(r["n_eos"] for r in rows) == n_docs
        # doc ranges chain monotonically across sequences
        for a, b in zip(rows, rows[1:]):
            assert a["last_doc"] <= b["first_doc"]

    def test_seq_len_one_and_validation(self):
        from textalyzer_ray.pipelines.chunking import sequence_pack

        t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["ab cd"]})
        got = sequence_pack(rd.from_arrow(t), seq_len=1).take_all()
        # slots: ab(3) cd(3) EOS(1) -> one slot per sequence, slot1==1
        assert self.as_tuples(got) == [
            (0, 1, 1, 0, 1, 1, 3, 3),
            (1, 1, 1, 0, 1, 1, 3, 3),
            (2, 1, 1, 1, 1, 1, 1, 1),
        ]
        with pytest.raises(ValueError):
            sequence_pack(rd.from_arrow(t), seq_len=0)
