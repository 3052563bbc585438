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
        small = triangle_counts(rd.from_arrow(t).repartition(4)).take_all()
        bc = triangle_counts(
            rd.from_arrow(t).repartition(4), small_threshold=0
        ).take_all()
        dist = triangle_counts(
            rd.from_arrow(t).repartition(4),
            broadcast_threshold=0,
            small_threshold=0,
        ).take_all()
        assert small == want  # one-task path
        assert bc == want     # distributed, broadcast degrees
        assert dist == want   # distributed, union-tag degrees

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


class TestTextRank:
    def test_matches_numpy_reference(self):
        import numpy as np

        from textalyzer_ray.pipelines.graph import textrank_keywords

        texts = ["alpha beta gamma alpha beta delta"] * 4
        got = textrank_keywords(
            rd.from_arrow(pa.table({"text": texts})), min_count=3, n_iter=10
        ).take_all()
        # reference PageRank on the symmetrized bigram graph
        # bigrams per doc: (alpha,beta)x2, (beta,gamma), (gamma,alpha),
        # (beta,delta) -> x4 docs; und counts: {a,b}:8? per doc: a-b 2,
        # b-g 1, g-a 1, b-d 1 -> x4
        nodes = sorted({"alpha", "beta", "gamma", "delta"})
        idx = {n: i for i, n in enumerate(nodes)}
        und = {("alpha", "beta"): 8, ("beta", "gamma"): 4,
               ("alpha", "gamma"): 4, ("beta", "delta"): 4}
        N = len(nodes)
        W = np.zeros((N, N))
        for (a, b), w in und.items():
            W[idx[a], idx[b]] = w
            W[idx[b], idx[a]] = w
        out_w = W.sum(axis=1)
        pr = np.full(N, 1.0 / N)
        d = 0.85
        for _ in range(10):
            contrib = np.zeros(N)
            for s in range(N):
                if out_w[s]:
                    for t in range(N):
                        if W[s, t]:
                            contrib[t] += pr[s] * (W[s, t] / out_w[s])
            dang = pr[out_w == 0].sum()
            pr = (1 - d) / N + d * (contrib + dang / N)
        order = sorted(range(N), key=lambda i: (-pr[i], nodes[i]))
        assert [r["word"] for r in got] == [nodes[i] for i in order]
        for r in got:
            assert abs(r["pr"] - pr[idx[r["word"]]]) < 1e-12

    def test_sf001_margins_vs_duckdb(self):
        """Cross-engine pr parity + the two hash-safety margins: the
        engine-vs-DuckDB maxdiff must sit far below both the minimum
        adjacent pr gap (rank stability) and the minimum distance to a
        9-decimal rounding boundary (value-hash stability)."""
        import duckdb
        import numpy as np

        import __ray_entry__ as contract

        sf = "/root/testdata/sf0.001"
        got = contract._q_textrank_keywords(sf).take_all()
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        want = con.sql(contract.oracle_sql()["textrank_keywords"]).fetchall()
        gm = {r["word"]: (r["pr"], r["pr_rank"]) for r in got}
        wm = {r[0]: (r[1], r[2]) for r in want}
        assert set(gm) == set(wm) and len(gm) > 10
        maxdiff = max(abs(gm[k][0] - wm[k][0]) for k in gm)
        assert all(gm[k][1] == wm[k][1] for k in gm)
        prs = sorted((v[0] for v in gm.values()), reverse=True)
        min_gap = min(a - b for a, b in zip(prs, prs[1:]))
        bdist = min(
            abs((p * 1e9) - np.floor(p * 1e9) - 0.5) * 1e-9 for p in prs
        )
        assert maxdiff < 1e-14
        assert min_gap > 1e3 * maxdiff, (min_gap, maxdiff)
        assert bdist > 1e3 * maxdiff, (bdist, maxdiff)


def kcore_brute(edges, k):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        deg: dict = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in und if a in alive and b in alive}
        if nxt == und:
            break
        und = nxt
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return [
        {"node": n, "deg": d} for n, d in sorted(deg.items()) if d >= k
    ]


class TestKCore:
    def test_clique_plus_chain(self):
        from textalyzer_ray.pipelines.graph import kcore_decompose

        # K5 clique (4-core) + a chain hanging off it + an isolated
        # triangle: the chain and triangle must peel away in cascading
        # rounds, the clique survives with deg 4
        E = [
            (a, b)
            for a in "abcde"
            for b in "abcde"
            if a < b
        ] + [("e", "f"), ("f", "g"), ("g", "h"), ("x", "y"), ("y", "z"),
             ("x", "z")]
        t = pa.table({"a": [e[0] for e in E], "b": [e[1] for e in E]})
        got = kcore_decompose(rd.from_arrow(t).repartition(3), 4).take_all()
        want = kcore_brute(E, 4)
        assert got == want
        assert sorted(r["node"] for r in got) == list("abcde")

    def test_random_graph_both_paths(self):
        from textalyzer_ray.pipelines.graph import kcore_decompose

        rng = random.Random(11)
        E = [(rng.randrange(40), rng.randrange(40)) for _ in range(260)]
        t = pa.table({"a": [e[0] for e in E], "b": [e[1] for e in E]})
        for k in (3, 6):
            want = kcore_brute(E, k)
            small = kcore_decompose(
                rd.from_arrow(t).repartition(4), k
            ).take_all()
            dist = kcore_decompose(
                rd.from_arrow(t).repartition(4), k,
                small_threshold=0, max_rounds=16,
            ).take_all()
            assert small == want, k
            assert dist == want, k

    def test_empty_and_all_peeled(self):
        from textalyzer_ray.pipelines.graph import kcore_decompose

        t = pa.table(
            {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}
        )
        assert kcore_decompose(rd.from_arrow(t), 2).take_all() == []
        # a tree has no 2-core
        E = [("a", "b"), ("b", "c"), ("c", "d"), ("b", "e")]
        t = pa.table({"a": [e[0] for e in E], "b": [e[1] for e in E]})
        assert kcore_decompose(rd.from_arrow(t), 2).take_all() == []


class TestLabelPropagation:
    """Sync weighted LPA: brute-force equivalence, path equality,
    planted-community recovery, string nodes, empty graph."""

    @staticmethod
    def brute(edges, n_iter):
        from collections import defaultdict

        wmap = defaultdict(int)
        for s, t, w in edges:
            if s == t:
                continue
            wmap[(s, t)] += w
            wmap[(t, s)] += w
        nodes = sorted({x for e in wmap for x in e})
        for v in nodes:
            wmap[(v, v)] += 1
        lab = {v: v for v in nodes}
        for _ in range(n_iter):
            votes = {v: defaultdict(int) for v in nodes}
            for (a, b), w in wmap.items():
                votes[a][lab[b]] += w
            lab = {
                v: sorted(votes[v].items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
                for v in nodes
            }
        return [{"node": v, "community": lab[v]} for v in nodes]

    @staticmethod
    def run(edges, n_iter, **kw):
        from textalyzer_ray.pipelines.graph import label_propagation

        t = pa.table(
            {
                "src": [e[0] for e in edges],
                "dst": [e[1] for e in edges],
                "w": [e[2] for e in edges],
            }
        )
        return label_propagation(
            rd.from_arrow(t).repartition(3), n_iter=n_iter, **kw
        ).take_all()

    @pytest.mark.parametrize("n_iter,seed", [(1, 1), (3, 2), (8, 3)])
    def test_matches_brute_force(self, n_iter, seed):
        import random

        rng = random.Random(seed)
        edges = [
            (rng.randint(0, 25), rng.randint(0, 25), rng.randint(1, 4))
            for _ in range(90)
        ]
        assert self.run(edges, n_iter) == self.brute(edges, n_iter)

    def test_small_equals_distributed(self):
        import random

        rng = random.Random(9)
        edges = [
            (rng.randint(0, 40), rng.randint(0, 40), rng.randint(1, 3))
            for _ in range(150)
        ]
        a = self.run(edges, 4)
        b = self.run(edges, 4, small_threshold=0)
        assert a == b and len(a) > 0

    def test_string_nodes_lexicographic_ties(self):
        # two nodes voting each other: tie between own and peer label
        # -> both adopt the lexicographically smaller one
        edges = [("beta", "alpha", 1)]
        out = self.run(edges, 1)
        assert out == self.brute(edges, 1)
        assert all(r["community"] == "alpha" for r in out)

    def test_planted_communities_recovered(self, tmp_path):
        """The sf0.001 planted residue graph (hub star + chain +
        bridges) must collapse to exactly the 20 planted hubs."""
        import __ray_entry__ as entry

        out = entry._q_lpa_communities("/root/testdata/sf0.001").take_all()
        assert len(out) == 500
        comms = {r["community"] for r in out}
        assert comms == set(range(20))  # hubs are ids 0..19
        # every node's community is its residue-class hub
        assert all(r["community"] == r["node"] % 20 for r in out)

    def test_empty_edges(self):
        assert self.run([], 3) == []


class TestHopDistance:
    def _graph(self):
        import pyarrow as pa
        import ray.data as rd

        # two components: a chain 0->1->2->3->4 (with a back-edge
        # 2->0) and 10->11; 20 is isolated/unreachable
        edges = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([0, 1, 2, 3, 10, 2], pa.int64()),
                    "dst": pa.array([1, 2, 3, 4, 11, 0], pa.int64()),
                }
            )
        )
        seeds = rd.from_arrow(
            pa.table({"node": pa.array([0, 10], pa.int64())})
        )
        return edges, seeds

    def test_hand_graph_small_path(self):
        from textalyzer_ray.pipelines.graph import hop_distance

        edges, seeds = self._graph()
        got = {
            r["node"]: r["dist"]
            for r in hop_distance(edges, seeds, n_rounds=3).take_all()
        }
        # 4 is 4 hops away -> omitted at n_rounds=3; 20 never appears
        assert got == {0: 0, 10: 0, 1: 1, 11: 1, 2: 2, 3: 3}

    def test_distributed_equals_small(self):
        from textalyzer_ray.pipelines.graph import hop_distance

        edges, seeds = self._graph()
        small = hop_distance(edges, seeds, n_rounds=4).take_all()
        dist = hop_distance(
            edges, seeds, n_rounds=4, small_threshold=0
        ).take_all()
        assert sorted((r["node"], r["dist"]) for r in small) == sorted(
            (r["node"], r["dist"]) for r in dist
        )
        assert {r["node"]: r["dist"] for r in small}[4] == 4

    def test_min_dist_not_first_visit(self):
        """A node reachable two ways gets the MIN distance even when
        the longer path's round also emits it."""
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.graph import hop_distance

        edges = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([0, 0, 1, 2], pa.int64()),
                    # 0->3 direct AND 0->1->2->3
                    "dst": pa.array([3, 1, 2, 3], pa.int64()),
                }
            )
        )
        seeds = rd.from_arrow(pa.table({"node": pa.array([0], pa.int64())}))
        for thr in (2_000_000, 0):
            got = {
                r["node"]: r["dist"]
                for r in hop_distance(
                    edges, seeds, n_rounds=3, small_threshold=thr
                ).take_all()
            }
            assert got == {0: 0, 1: 1, 3: 1, 2: 2}, (thr, got)

    def test_empty_frontier_stops(self):
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.graph import hop_distance

        edges = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([5], pa.int64()),
                    "dst": pa.array([6], pa.int64()),
                }
            )
        )
        seeds = rd.from_arrow(pa.table({"node": pa.array([0], pa.int64())}))
        got = hop_distance(edges, seeds, n_rounds=5).take_all()
        assert [(r["node"], r["dist"]) for r in got] == [(0, 0)]


class TestSeededTextrank:
    def test_seed_restart_semantics(self):
        """Restart mass goes only to seeds: words unreachable from the
        seed set get pr exactly 0, and a seed out-ranks a structurally
        identical non-seed."""
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.graph import textrank_keywords

        # two disjoint word components: {alpha,beta} and {gamma,delta}
        docs = rd.from_arrow(
            pa.table(
                {
                    "text": pa.array(
                        ["alpha beta " * 6, "gamma delta " * 6]
                    ),
                }
            )
        )
        got = {
            r["word"]: r["pr"]
            for r in textrank_keywords(
                docs, min_count=5, seeds=["alpha"]
            ).take_all()
        }
        assert got["gamma"] == 0.0 and got["delta"] == 0.0
        assert got["alpha"] > got["beta"] > 0.0

    def test_small_equals_distributed(self):
        import pyarrow as pa
        import ray.data as rd

        from textalyzer_ray.pipelines.links import host_pagerank

        rows = [
            ("a", "b", 2), ("a", "c", 1), ("b", "c", 3),
            ("c", "a", 1), ("d", "a", 5), ("b", "d", 1),
        ]
        edges = rd.from_arrow(
            pa.table(
                {
                    "src_host": pa.array([r[0] for r in rows]),
                    "dst_host": pa.array([r[1] for r in rows]),
                    "n_links": pa.array(
                        [r[2] for r in rows], pa.int64()
                    ),
                }
            )
        )
        small = {
            r["host"]: (r["pr"], r["pr_rank"])
            for r in host_pagerank(
                edges, n_iter=6, seeds=["a", "d"]
            ).take_all()
        }
        edges2 = rd.from_arrow(
            pa.table(
                {
                    "src_host": pa.array([r[0] for r in rows]),
                    "dst_host": pa.array([r[1] for r in rows]),
                    "n_links": pa.array(
                        [r[2] for r in rows], pa.int64()
                    ),
                }
            )
        )
        big = {
            r["host"]: (r["pr"], r["pr_rank"])
            for r in host_pagerank(
                edges2, n_iter=6, seeds=["a", "d"], small_threshold=0
            ).take_all()
        }
        assert set(small) == set(big)
        for h in small:
            assert small[h][1] == big[h][1]
            assert abs(small[h][0] - big[h][0]) < 1e-14
        # restart mass conserved
        assert abs(sum(v[0] for v in small.values()) - 1.0) < 1e-12

    def test_disjoint_seeds_raise(self):
        import pyarrow as pa
        import pytest as _pytest
        import ray.data as rd

        from textalyzer_ray.pipelines.links import host_pagerank

        edges = rd.from_arrow(
            pa.table(
                {
                    "src_host": pa.array(["a"]),
                    "dst_host": pa.array(["b"]),
                    "n_links": pa.array([1], pa.int64()),
                }
            )
        )
        with _pytest.raises(Exception, match="intersect"):
            host_pagerank(edges, seeds=["zzz"]).take_all()

    def test_sf001_margins_vs_duckdb(self):
        """Seeded-chain float-hash certification (separate from the
        uniform chain: zero-pr plateaus and seed spikes change the
        margin structure): cross-engine maxdiff far below the minimum
        POSITIVE adjacent pr gap and the minimum 9-decimal boundary
        distance over nonzero prs."""
        import duckdb
        import numpy as np

        import __ray_entry__ as contract

        sf = "/root/testdata/sf0.001"
        got = contract._q_seeded_textrank(sf).take_all()
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        want = con.sql(contract.oracle_sql()["seeded_textrank"]).fetchall()
        gm = {r["word"]: (r["pr"], r["pr_rank"]) for r in got}
        wm = {r[0]: (r[1], r[2]) for r in want}
        assert set(gm) == set(wm) and len(gm) > 10
        maxdiff = max(abs(gm[k][0] - wm[k][0]) for k in gm)
        assert all(gm[k][1] == wm[k][1] for k in gm)
        prs = sorted((v[0] for v in gm.values()), reverse=True)
        pos_gaps = [a - b for a, b in zip(prs, prs[1:]) if a != b]
        min_gap = min(pos_gaps)
        bdist = min(
            abs((p * 1e9) - np.floor(p * 1e9) - 0.5) * 1e-9
            for p in prs
            if p > 0.0
        )
        assert maxdiff < 1e-14
        assert min_gap > 1e3 * maxdiff, (min_gap, maxdiff)
        assert bdist > 1e3 * maxdiff, (bdist, maxdiff)


def test_common_neighbors_square(ray_session):
    """Square 0-1-2-3-0: exactly the two diagonals share 2 neighbors
    and are non-adjacent; adjacent pairs are suppressed even when they
    share neighbors (add edge 0-2 -> (0,2) disappears, (1,3) stays)."""
    import pyarrow as pa
    import ray.data as rd

    from textalyzer_ray.pipelines.graph import common_neighbors

    def edges(pairs):
        return rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([p[0] for p in pairs], pa.int64()),
                    "b": pa.array([p[1] for p in pairs], pa.int64()),
                }
            )
        ).repartition(2)

    sq = [(0, 1), (1, 2), (2, 3), (3, 0)]
    out = common_neighbors(edges(sq), min_cn=2).take_all()
    assert [(r["id_a"], r["id_b"], r["cn"]) for r in out] == [
        (0, 2, 2),
        (1, 3, 2),
    ]

    out2 = common_neighbors(edges(sq + [(0, 2)]), min_cn=2).take_all()
    assert [(r["id_a"], r["id_b"], r["cn"]) for r in out2] == [(1, 3, 2)]


def test_common_neighbors_small_equals_distributed(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from textalyzer_ray.pipelines.graph import common_neighbors

    # planted-community-like structure: hub stars + chain, reversed
    # duplicates and self-loops thrown in
    pairs = (
        [(h, n) for h in (0, 1) for n in range(2 + h, 40, 2)]
        + [(n, n + 1) for n in range(30)]
        + [(5, 5), (7, 3)]
    )
    t = pa.table(
        {
            "a": pa.array([p[0] for p in pairs], pa.int64()),
            "b": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )

    def run(thr):
        return common_neighbors(
            rd.from_arrow(t).repartition(3), min_cn=2, small_threshold=thr
        ).take_all()

    small, dist = run(2_000_000), run(0)
    assert small == dist and len(small) > 0


def _edge_ds(pairs):
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in pairs], pa.int64()),
                "b": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    ).repartition(2)


def test_k_truss_two_cliques(ray_session):
    """K5 + K4 joined by a chain: at k=4 both cliques survive (support
    3 and 2), the chain dies; at k=5 only K5 survives."""
    from itertools import combinations

    from textalyzer_ray.pipelines.graph import k_truss

    k5 = list(combinations(range(5), 2))
    k4 = list(combinations(range(10, 14), 2))
    chain = [(4, 7), (7, 10)]
    edges = k5 + k4 + chain

    out4 = k_truss(_edge_ds(edges), k=4).take_all()
    assert {(r["id_a"], r["id_b"]) for r in out4} == set(k5) | set(k4)
    assert all(
        r["support"] == (3 if r["id_a"] < 5 else 2) for r in out4
    )

    out5 = k_truss(_edge_ds(edges), k=5).take_all()
    assert {(r["id_a"], r["id_b"]) for r in out5} == set(k5)


def test_k_truss_cascade_to_empty(ray_session):
    """Two glued triangles (edges 01,02,12,13,23): only edge 12 has
    support 2, so k=4 peels the rest in round 1, which starves 12 in
    round 2 — the multi-round cascade must reach the empty fixed
    point, not stop after one pass."""
    from textalyzer_ray.pipelines.graph import k_truss

    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    assert k_truss(_edge_ds(edges), k=4).take_all() == []


def test_k_truss_small_equals_distributed(ray_session):
    from itertools import combinations

    from textalyzer_ray.pipelines.graph import k_truss

    edges = (
        list(combinations(range(6), 2))
        + list(combinations(range(20, 25), 2))
        + [(n, n + 1) for n in range(30)]
        + [(3, 1), (9, 9)]  # reversed dup + self-loop
    )

    def run(thr):
        return k_truss(
            _edge_ds(edges), k=5, small_threshold=thr
        ).take_all()

    small, dist = run(2_000_000), run(0)
    assert small == dist and len(small) > 0
