"""Triangle counting: brute-force equivalence over string and int
graphs, duplicate/self-loop robustness, degree-attach path equality."""

import itertools
import random

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.pipelines.graph import (
    triangle_counts,
    word_graph_triangles,
)

pytestmark = pytest.mark.usefixtures("quiet_data_context")


def brute(edges):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                counts[n] = counts.get(n, 0) + 1
    return [{"node": n, "n_tri": c} for n, c in sorted(counts.items())]


class TestTriangles:
    def test_k4_with_noise_edges(self):
        # K4 + tail + isolated edge + dup/reversed/self edges
        E = [
            ("a", "b"), ("b", "a"), ("a", "c"), ("a", "d"), ("b", "c"),
            ("b", "d"), ("c", "d"), ("d", "e"), ("e", "e"), ("x", "y"),
        ]
        t = pa.table({"a": [e[0] for e in E], "b": [e[1] for e in E]})
        got = triangle_counts(rd.from_arrow(t).repartition(3)).take_all()
        assert got == brute(E)
        assert all(r["n_tri"] == 3 for r in got)  # K4: 3 each

    def test_random_int_graph_both_paths(self):
        rng = random.Random(7)
        E = [(rng.randrange(30), rng.randrange(30)) for _ in range(150)]
        t = pa.table({"a": [e[0] for e in E], "b": [e[1] for e in E]})
        want = brute(E)
        bc = triangle_counts(rd.from_arrow(t).repartition(4)).take_all()
        dist = triangle_counts(
            rd.from_arrow(t).repartition(4), broadcast_threshold=0
        ).take_all()
        assert bc == want
        assert dist == want

    def test_triangle_free_graph(self):
        # bipartite graphs have no triangles
        E = [(f"l{i}", f"r{j}") for i in range(4) for j in range(4)]
        t = pa.table({"a": [e[0] for e in E], "b": [e[1] for e in E]})
        assert triangle_counts(rd.from_arrow(t)).take_all() == []

    def test_empty_edges(self):
        t = pa.table(
            {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}
        )
        assert triangle_counts(rd.from_arrow(t)).take_all() == []

    def test_word_graph_planted(self):
        # "alpha beta gamma" repeated -> edges (alpha,beta),(beta,gamma),
        # plus "gamma alpha" closes the triangle
        texts = ["alpha beta gamma alpha beta gamma alpha beta gamma"] * 2
        got = word_graph_triangles(
            rd.from_arrow(pa.table({"text": texts})), min_count=3
        ).take_all()
        assert got == [
            {"node": "alpha", "n_tri": 1},
            {"node": "beta", "n_tri": 1},
            {"node": "gamma", "n_tri": 1},
        ]
