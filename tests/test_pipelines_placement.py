"""rendezvous_shards (layout.py) + quota_select (curation.py)."""

import numpy as np
import pyarrow as pa


def test_rendezvous_matches_scalar_hash(ray_session):
    import ray.data as rd

    from textalyzer_ray.core.fingerprint import hll_hash64
    from textalyzer_ray.pipelines.layout import rendezvous_shards

    ids = list(range(0, 97, 3))
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64())})
    ).repartition(4)
    rows = rendezvous_shards(ds, n_nodes=8).take_all()
    assert [r["doc_id"] for r in rows] == ids
    for r in rows:
        hs = [hll_hash64(f"{r['doc_id']}:{n}") for n in range(8)]
        best = max(range(8), key=lambda n: (hs[n], -n))
        assert r["owner"] == best
        assert r["hash_hi"] == hs[best] >> 32
        assert r["hash_lo"] == hs[best] & 0xFFFFFFFF


def test_rendezvous_minimal_movement(ray_session):
    """The HRW property the operator exists for: removing one node
    reassigns ONLY keys that node owned."""
    import ray.data as rd

    from textalyzer_ray.pipelines.layout import rendezvous_shards

    ids = pa.table({"doc_id": pa.array(range(200), pa.int64())})
    with_n = {
        r["doc_id"]: r["owner"]
        for r in rendezvous_shards(rd.from_arrow(ids), n_nodes=8).take_all()
    }
    without_last = {
        r["doc_id"]: r["owner"]
        for r in rendezvous_shards(rd.from_arrow(ids), n_nodes=7).take_all()
    }
    for k, o7 in without_last.items():
        if with_n[k] != 7:
            assert o7 == with_n[k], k


def test_quota_select_boundary(ray_session):
    import ray.data as rd

    from textalyzer_ray.pipelines.curation import quota_select

    t = pa.table(
        {
            "doc_id": pa.array(range(7), pa.int64()),
            "source": pa.array(["a"] * 4 + ["b"] * 3),
            "n_chars": pa.array([50, 30, 30, 10, 100, 100, 1], pa.int64()),
        }
    )
    rows = quota_select(
        rd.from_arrow(t).repartition(3), budget=100
    ).take_all()
    got = {r["doc_id"]: r["cum"] for r in rows}
    # group a sorted desc by chars, doc_id tiebreak: 50(d0),30(d1),30(d2),10(d3)
    # cums 50,80,110,120 -> keep d0,d1 (cum<=100); d2 exceeds
    # group b: 100(d4),100(d5),1(d6) -> cums 100,200,201 -> keep d4 only
    assert got == {0: 50, 1: 80, 4: 100}


def test_quota_select_exact_budget_inclusive(ray_session):
    import ray.data as rd

    from textalyzer_ray.pipelines.curation import quota_select

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "source": pa.array(["a", "a"]),
            "n_chars": pa.array([60, 40], pa.int64()),
        }
    )
    rows = quota_select(rd.from_arrow(t), budget=100).take_all()
    assert [(r["doc_id"], r["cum"]) for r in rows] == [(0, 60), (1, 100)]
