"""Link-graph pipeline tests: outlink extraction, host rollups —
checked against a pure-Python re-derivation of the webgen link set."""

import re

import pyarrow as pa
import pytest

import ray.data as rd

from textalyzer_ray.pipelines.links import (
    extract_outlinks,
    host_outdegree,
    site_linkgraph,
)
from textalyzer_ray.sources.webgen import cross_links_for, pages_from_documents

pytestmark = pytest.mark.usefixtures("quiet_data_context")

# The boilerplate hrefs every webgen page carries (webgen._NAV /
# _SIDEBAR / _FOOTER), all root-relative.
BOILERPLATE = (
    [f"/cat/{i}" for i in range(8)]
    + [f"/rel/{i}" for i in range(6)]
    + ["/about", "/terms", "/privacy"]
)


def pages_ds(n=7):
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array([f"doc body number {i} words" for i in range(n)]),
            "lang": pa.array(["en"] * n),
        }
    )
    return rd.from_arrow(pages_from_documents(docs)), n


def expected_links(doc_id):
    base = "https://docs.example"
    out = [(base + p, "docs.example") for p in BOILERPLATE]
    for href, _anchor in cross_links_for(doc_id):
        host = re.match(r"^https?://([^/]+)", href).group(1)
        out.append((href, host))
    return out


def test_extract_outlinks_matches_oracle():
    ds, n = pages_ds()
    got = extract_outlinks(ds).to_pandas()
    assert set(got.columns) == {"doc_id", "out_url", "out_host"}
    for d in range(n):
        rows = got[got.doc_id == d]
        assert (
            sorted(zip(rows.out_url, rows.out_host))
            == sorted(expected_links(d))
        ), f"doc {d} link set mismatch"
    # 17 boilerplate + 3 cross links, all distinct
    assert len(got) == 20 * n


def test_extract_outlinks_schema_is_native_string():
    ds, _ = pages_ds(2)
    schema = extract_outlinks(ds).schema()
    # joins reject large_string vs string keys; the stage must normalize
    assert schema.base_schema.field("out_url").type == pa.string()
    assert schema.base_schema.field("out_host").type == pa.string()


def test_host_outdegree_totals():
    ds, n = pages_ds()
    got = host_outdegree(ds).to_pandas().set_index("out_host")["n_links"]
    assert got.loc["docs.example"] == 17 * n
    cross = {h for d in range(n) for _u, h in expected_links(d)[17:]}
    assert got.drop("docs.example").sum() == 3 * n
    assert set(got.index) == {"docs.example"} | cross


def test_site_linkgraph_src_is_page_host():
    ds, n = pages_ds()
    got = site_linkgraph(ds).to_pandas()
    assert (got.src_host == "docs.example").all()
    assert got.n_links.sum() == 20 * n
    self_edge = got[(got.dst_host == "docs.example")]
    assert self_edge.n_links.iloc[0] == 17 * n


def test_outlinks_crawl_garbage_relative_href():
    # malformed / relative crawl hrefs still produce deterministic rows
    html = (
        b'<html><body><a href="nopath">x</a>'
        b'<a href="https://other.example/a">y</a>'
        b"<a href='single-quoted-ignored'>z</a></body></html>"
    )
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "url": pa.array(["https://host.example/p/1"]),
                "html": pa.array([html], pa.binary()),
            }
        )
    )
    got = extract_outlinks(ds).to_pandas().sort_values("out_url")
    # double-quoted hrefs only (webgen emits double quotes; the regex
    # contract is documented in pipelines/links.py)
    assert list(got.out_url) == [
        "https://host.example/nopath",
        "https://other.example/a",
    ]
    assert list(got.out_host) == ["host.example", "other.example"]


class TestHostPagerank:
    def _edges(self, rows):
        return rd.from_arrow(
            pa.table(
                {
                    "src_host": pa.array([r[0] for r in rows], pa.string()),
                    "dst_host": pa.array([r[1] for r in rows], pa.string()),
                    "n_links": pa.array([r[2] for r in rows], pa.int64()),
                }
            )
        )

    def test_two_node_cycle_analytic(self):
        from textalyzer_ray.pipelines.links import host_pagerank

        # a <-> b symmetric cycle: stationary distribution is uniform
        # and every iterate stays exactly (0.5, 0.5)
        rows = host_pagerank(
            self._edges([("a", "b", 1), ("b", "a", 1)]), n_iter=7
        ).take_all()
        assert {r["host"]: r["pr"] for r in rows} == {"a": 0.5, "b": 0.5}
        # tie on pr -> rank breaks host-ascending
        assert {r["host"]: r["pr_rank"] for r in rows} == {"a": 1, "b": 2}

    def test_mass_conserved_with_dangling(self):
        from textalyzer_ray.pipelines.links import host_pagerank

        # c is dangling (no out-edges); total rank mass must stay 1
        rows = host_pagerank(
            self._edges([("a", "b", 2), ("a", "c", 1), ("b", "c", 3)]),
            n_iter=10,
        ).take_all()
        assert abs(sum(r["pr"] for r in rows) - 1.0) < 1e-12
        # c receives from both a and b -> highest rank
        assert sorted(rows, key=lambda r: r["pr_rank"])[0]["host"] == "c"

    def test_distributed_path_matches_small(self):
        from textalyzer_ray.pipelines.links import host_pagerank

        edges = [
            ("a", "b", 2), ("a", "c", 1), ("b", "c", 3),
            ("c", "a", 1), ("d", "a", 5), ("b", "d", 1),
        ]
        small = {
            r["host"]: (r["pr"], r["pr_rank"])
            for r in host_pagerank(self._edges(edges), n_iter=6).take_all()
        }
        big = {
            r["host"]: (r["pr"], r["pr_rank"])
            for r in host_pagerank(
                self._edges(edges), n_iter=6, small_threshold=0
            ).take_all()
        }
        assert set(small) == set(big)
        for h in small:
            assert small[h][1] == big[h][1]
            assert abs(small[h][0] - big[h][0]) < 1e-14

    def test_empty_edges(self):
        from textalyzer_ray.pipelines.links import host_pagerank

        assert host_pagerank(self._edges([])).count() == 0


class TestAnchorRollup:
    def test_top_anchors_match_python_rederivation(self):
        from collections import Counter

        from textalyzer_ray.pipelines.links import top_anchors_per_host

        ds, n = pages_ds()
        rows = top_anchors_per_host(ds, k=3).take_all()
        # re-derive: every page contributes the static anchors on its
        # own host plus 3 cross anchors from doc_id arithmetic
        counts = Counter()
        static = (
            [f"Category {i} links here" for i in range(8)]
            + [f"Related article number {i}" for i in range(6)]
            + ["About us", "Terms of service", "Privacy policy"]
        )
        for d in range(n):
            for a in static:
                counts[("docs.example", a)] += 1
            for href, anchor in cross_links_for(d):
                host = re.match(r"^https?://([^/]+)", href).group(1)
                counts[(host, anchor)] += 1
        expected = {}
        for host in {h for h, _ in counts}:
            anchors = sorted(
                ((n_, a) for (h, a), n_ in counts.items() if h == host),
                key=lambda x: (-x[0], x[1]),
            )[:3]
            for rank, (n_, a) in enumerate(anchors, 1):
                expected[(host, rank)] = (a, n_)
        got = {(r["out_host"], r["rank"]): (r["anchor"], r["n"]) for r in rows}
        assert got == expected

    def test_anchor_rows_are_native_string(self):
        from textalyzer_ray.pipelines.links import _batch_anchors

        ds, _ = pages_ds(2)
        t = pa.concat_tables(
            ds.map_batches(
                _batch_anchors, batch_format="pyarrow"
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        )
        assert t.schema.field("out_host").type == pa.string()
        assert t.schema.field("anchor").type == pa.string()
        assert t.num_rows == 2 * 20  # 17 static + 3 cross per page


class TestHostHits:
    def _edges(self, rows):
        return rd.from_arrow(
            pa.table(
                {
                    "src_host": pa.array([r[0] for r in rows], pa.string()),
                    "dst_host": pa.array([r[1] for r in rows], pa.string()),
                    "n_links": pa.array([r[2] for r in rows], pa.int64()),
                }
            )
        )

    _ROWS = [
        ("a", "x", 2), ("a", "y", 1), ("b", "x", 3),
        ("c", "y", 1), ("c", "z", 4), ("b", "z", 1),
    ]

    def test_bipartite_structure_and_norms(self):
        from textalyzer_ray.pipelines.links import host_hits

        rows = {
            r["host"]: r
            for r in host_hits(self._edges(self._ROWS), n_iter=6).take_all()
        }
        # pure hubs carry no authority and vice versa
        assert all(rows[h]["auth"] == 0.0 for h in "abc")
        assert all(rows[h]["hub"] == 0.0 for h in "xyz")
        # L2-normalized score vectors
        assert abs(sum(v["hub"] ** 2 for v in rows.values()) - 1.0) < 1e-12
        assert abs(sum(v["auth"] ** 2 for v in rows.values()) - 1.0) < 1e-12
        # ranks are a permutation of 1..n with zero-score nodes last,
        # tie-broken host-ascending
        assert sorted(v["hub_rank"] for v in rows.values()) == list(range(1, 7))
        assert [h for h, v in sorted(rows.items(), key=lambda kv: kv[1]["hub_rank"])][3:] == ["x", "y", "z"]

    def test_distributed_path_matches_small(self):
        from textalyzer_ray.pipelines.links import host_hits

        small = {
            r["host"]: r
            for r in host_hits(self._edges(self._ROWS), n_iter=6).take_all()
        }
        big = {
            r["host"]: r
            for r in host_hits(
                self._edges(self._ROWS), n_iter=6, small_threshold=0
            ).take_all()
        }
        assert set(small) == set(big)
        for h in small:
            assert small[h]["hub_rank"] == big[h]["hub_rank"]
            assert small[h]["auth_rank"] == big[h]["auth_rank"]
            assert abs(small[h]["hub"] - big[h]["hub"]) < 1e-14
            assert abs(small[h]["auth"] - big[h]["auth"]) < 1e-14

    def test_empty_edges(self):
        from textalyzer_ray.pipelines.links import host_hits

        assert host_hits(self._edges([])).count() == 0

    def test_oracle_margins_sf0001(self):
        """Float-hash certification for hits_doc_host (the pagerank
        protocol): cross-engine maxdiff must sit >= 3 orders below both
        the smallest nonzero adjacent score gap and the closest
        9-decimal rounding boundary, and quantized ranks must agree
        exactly."""
        import duckdb
        import numpy as np

        import __ray_entry__ as contract

        sf = "/root/testdata/sf0.001"
        got = contract._q_hits_doc_host(sf).take_all()
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        want = con.sql(contract.oracle_sql()["hits_doc_host"]).fetchall()
        gm = {r["host"]: (r["hub"], r["auth"], r["hub_rank"], r["auth_rank"]) for r in got}
        wm = {r[0]: (r[1], r[2], r[3], r[4]) for r in want}
        assert set(gm) == set(wm) and len(gm) > 500
        maxdiff = max(
            max(abs(gm[k][0] - wm[k][0]), abs(gm[k][1] - wm[k][1])) for k in gm
        )
        assert all(gm[k][2:] == wm[k][2:] for k in gm)
        vals = sorted({v for k in gm for v in (gm[k][0], gm[k][1])})
        min_gap = min(b - a for a, b in zip(vals, vals[1:]) if b - a > 0)
        bdist = min(
            abs((v * 1e9) - np.floor(v * 1e9) - 0.5) * 1e-9
            for v in vals
            if v > 0
        )
        assert maxdiff < 1e-14
        assert min_gap > 1e3 * maxdiff, (min_gap, maxdiff)
        assert bdist > 1e3 * maxdiff, (bdist, maxdiff)


class TestHostCocitation:
    def _pages(self, htmls):
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(htmls)), pa.int64()),
                    "url": pa.array(
                        [f"https://src{i}.example/p" for i in range(len(htmls))]
                    ),
                    "html": pa.array(
                        [h.encode() for h in htmls], pa.binary()
                    ),
                }
            )
        )

    @staticmethod
    def _html(hosts):
        return "".join(f'<a href="https://{h}/x">l</a>' for h in hosts)

    def test_counts_degrees_jaccard_by_hand(self):
        from textalyzer_ray.pipelines.links import host_cocitation

        pages = self._pages(
            [
                self._html(["a.com", "b.com"]),
                self._html(["a.com", "b.com", "c.com"]),
                self._html(["a.com", "c.com"]),
                self._html(["b.com", "b.com"]),  # dup hrefs: one incidence
            ]
        )
        rows = {
            (r["host_a"], r["host_b"]): r
            for r in host_cocitation(pages, min_count=2).take_all()
        }
        # (a,b): docs 0,1 -> 2; (a,c): docs 1,2 -> 2; (b,c): doc 1 only
        assert set(rows) == {("a.com", "b.com"), ("a.com", "c.com")}
        ab = rows[("a.com", "b.com")]
        assert (ab["n_common"], ab["deg_a"], ab["deg_b"]) == (2, 3, 3)
        assert ab["jaccard"] == 2 / (3 + 3 - 2)
        ac = rows[("a.com", "c.com")]
        assert (ac["n_common"], ac["deg_a"], ac["deg_b"]) == (2, 3, 2)
        assert ac["jaccard"] == 2 / (3 + 2 - 2)

    def test_max_fanout_excludes_whole_doc(self):
        from textalyzer_ray.pipelines.links import host_cocitation

        # doc 0 has 3 distinct hosts -> excluded at max_fanout=2, so
        # its incidences count neither toward pairs NOR degrees
        pages = self._pages(
            [
                self._html(["a.com", "b.com", "c.com"]),
                self._html(["a.com", "b.com"]),
                self._html(["a.com", "b.com"]),
            ]
        )
        rows = host_cocitation(pages, min_count=2, max_fanout=2).take_all()
        assert len(rows) == 1
        r = rows[0]
        assert (r["host_a"], r["host_b"], r["n_common"]) == ("a.com", "b.com", 2)
        assert (r["deg_a"], r["deg_b"]) == (2, 2)
        assert r["jaccard"] == 1.0

    def test_no_pairs_below_min_count(self):
        from textalyzer_ray.pipelines.links import host_cocitation

        pages = self._pages([self._html(["a.com", "b.com"])])
        assert host_cocitation(pages, min_count=2).count() == 0
