"""PMI collocations: brute-force equivalence, broadcast/distributed
path equality, partitioning invariance, sentinel safety."""

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.pipelines.collocations import pmi_collocations

pytestmark = pytest.mark.usefixtures("quiet_data_context")


def brute_pmi(texts, min_count):
    from textalyzer_ray.core.textmetrics import tokenize

    toks = [tokenize(t) for t in texts]
    uni: dict = {}
    big: dict = {}
    n = 0
    for ts in toks:
        n += len(ts)
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    rows = []
    for (a, b), c in sorted(big.items()):
        if c >= min_count:
            rows.append(
                {
                    "w1": a,
                    "w2": b,
                    "c_xy": c,
                    "c_x": uni[a],
                    "c_y": uni[b],
                    "lift": (c * n) / (uni[a] * uni[b]),
                }
            )
    return rows


TEXTS = [
    "red wine red wine red wine pairs well",
    "white wine and red wine on the table",
    "red wine again and red herring too",
    "herring red herring red herring swims",
    "wine red wine red wine red",
    "",
    "one off words only here",
]


class TestPmi:
    def test_matches_brute_force_any_partitioning(self):
        want = brute_pmi(TEXTS, 3)
        assert want, "planted corpus must produce collocations"
        for parts in (1, 3, 7):
            t = pa.table({"text": TEXTS})
            got = pmi_collocations(
                rd.from_arrow(t).repartition(parts), min_count=3
            ).take_all()
            assert got == want, f"parts={parts}"

    def test_paths_equal(self):
        t = pa.table({"text": TEXTS})
        bc = pmi_collocations(rd.from_arrow(t), min_count=3).take_all()
        dist = pmi_collocations(
            rd.from_arrow(t), min_count=3, broadcast_threshold=0
        ).take_all()
        assert bc == dist

    def test_empty_and_no_survivors(self):
        t = pa.table({"text": pa.array([], pa.string())})
        assert pmi_collocations(rd.from_arrow(t)).take_all() == []
        t2 = pa.table({"text": ["all words distinct here now"]})
        assert pmi_collocations(rd.from_arrow(t2), min_count=2).take_all() == []

    def test_repeated_word_bigram(self):
        # w1 == w2 ("red red" never occurs; "wine wine"? plant one)
        t = pa.table({"text": ["echo echo echo echo"]})
        got = pmi_collocations(rd.from_arrow(t), min_count=3).take_all()
        assert got == [
            {
                "w1": "echo",
                "w2": "echo",
                "c_xy": 3,
                "c_x": 4,
                "c_y": 4,
                "lift": (3 * 4) / (4 * 4),
            }
        ]
