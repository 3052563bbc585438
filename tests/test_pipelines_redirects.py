"""resolve_redirects (pointer jumping) + url_templates (links.py)."""

import numpy as np
import pyarrow as pa
import pytest


def _chain_edges():
    """Chains over string urls: per block of 8, t -> t-1 unless
    t % 8 == 0 (root); plus one isolated self-contained 2-chain."""
    edges = []
    for t in range(1, 40):
        if t % 8 != 0:
            edges.append((f"u{t}", f"u{t-1}"))
    edges.append(("z1", "z0"))
    return edges


def _expected(edges):
    step = dict(edges)
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    out = {}
    for n in nodes:
        cur, hops = n, 0
        while cur in step:
            cur = step[cur]
            hops += 1
        out[n] = (cur, hops)
    return out


@pytest.mark.parametrize("small_threshold", [10**9, 0])
def test_resolve_redirects_paths_equal(ray_session, small_threshold):
    import ray.data as rd

    from textalyzer_ray.pipelines.links import resolve_redirects

    edges = _chain_edges()
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in edges]),
                "dst": pa.array([d for _, d in edges]),
            }
        )
    ).repartition(3)
    got = {
        r["node"]: (r["root"], r["hops"])
        for r in resolve_redirects(ds, n_rounds=4, small_threshold=small_threshold).take_all()
    }
    assert got == _expected(edges)


def test_resolve_redirects_rejects_nonfunctional(ray_session):
    import ray
    import ray.data as rd

    from textalyzer_ray.pipelines.links import resolve_redirects

    ds = rd.from_arrow(
        pa.table({"src": pa.array(["a", "a"]), "dst": pa.array(["b", "c"])})
    )
    with pytest.raises(Exception, match="not functional"):
        resolve_redirects(ds, small_threshold=10**9).take_all()
    ds2 = rd.from_arrow(
        pa.table({"src": pa.array(["a", "a"]), "dst": pa.array(["b", "c"])})
    )
    with pytest.raises(Exception, match="not functional"):
        resolve_redirects(ds2, small_threshold=0).take_all()


def test_resolve_redirects_empty(ray_session):
    import ray.data as rd

    from textalyzer_ray.pipelines.links import resolve_redirects

    ds = rd.from_arrow(
        pa.schema([("src", pa.string()), ("dst", pa.string())]).empty_table()
    )
    assert resolve_redirects(ds).count() == 0


def test_url_templates_planted(ray_session):
    import ray.data as rd

    from textalyzer_ray.pipelines.links import url_templates

    urls = [
        "https://a.example/page/1",
        "https://a.example/page/22",
        "https://a.example/page/22",  # dup url
        "https://a.example/about",
        "https://b.example/y2024/m12/d31",
    ]
    rows = url_templates(
        rd.from_arrow(pa.table({"url": pa.array(urls)})).repartition(2)
    ).take_all()
    got = {(r["host"], r["template"]): (r["n_links"], r["n_urls"]) for r in rows}
    assert got == {
        ("a.example", "/page/{n}"): (3, 2),
        ("a.example", "/about"): (1, 1),
        ("b.example", "/y{n}/m{n}/d{n}"): (1, 1),
    }
