"""Global rank / NTILE / RRF (pipelines/rank.py) + the rotation's
grouped robust-stats and scheduler operators."""

import numpy as np
import pyarrow as pa
import pytest

from textalyzer_ray.pipelines.rank import ntile_of_rank


def test_ntile_formula_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    for n, k in [(13, 5), (10, 10), (7, 10), (1, 4), (100, 7), (23, 1)]:
        exp = [
            b
            for (_, b) in con.execute(
                f"SELECT i, ntile({k}) OVER (ORDER BY i) FROM range({n}) t(i) ORDER BY i"
            ).fetchall()
        ]
        got = ntile_of_rank(np.arange(n, dtype=np.int64), n, k).tolist()
        assert got == exp, (n, k)


def test_lower_median_parity_polars_duckdb_numpy():
    """The discrete lower median (sorted[(n-1)//2]) is the SAME element
    in polars quantile(0.5, 'lower'), DuckDB quantile_disc(0.5), and
    numpy indexing — the cross-engine contract source_outliers rests
    on. Covers even/odd n and heavy duplicates."""
    import duckdb
    import polars as pl

    con = duckdb.connect()
    rng = np.random.default_rng(7)
    for n in (1, 2, 3, 4, 5, 8, 9, 100, 101):
        vals = rng.integers(0, 5, size=n).tolist()
        ref = sorted(vals)[(n - 1) // 2]
        got_pl = pl.DataFrame({"x": vals}).select(
            pl.col("x").quantile(0.5, interpolation="lower")
        ).item()
        got_db = con.execute(
            f"SELECT quantile_disc(x, 0.5) FROM (SELECT unnest({vals}) AS x)"
        ).fetchone()[0]
        assert got_pl == ref == got_db, (n, vals, got_pl, got_db, ref)


@pytest.fixture(scope="module")
def small_docs(ray_session_module):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 503  # odd + prime: uneven blocks, ragged ntile buckets
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "n_chars": pa.array(
                rng.integers(0, 40, size=n).astype(np.int64)
            ),  # heavy ties — the tie-break path
        }
    )
    return rd.from_arrow(t).repartition(7), t


@pytest.fixture(scope="module")
def ray_session_module(ray_session):
    return ray_session


def test_global_rank_matches_argsort(small_docs):
    from textalyzer_ray.pipelines.rank import global_rank

    ds, t = small_docs
    got = {
        r["doc_id"]: r["rank"]
        for r in global_rank(ds, ["n_chars"], [True]).take_all()
    }
    v = t["n_chars"].to_numpy()
    ids = t["doc_id"].to_numpy()
    order = np.lexsort((ids, -v))  # n_chars DESC, doc_id ASC
    exp = {int(ids[j]): i for i, j in enumerate(order)}
    assert got == exp


def test_score_deciles_bucket_sizes(small_docs):
    from textalyzer_ray.pipelines.rank import score_deciles

    ds, t = small_docs
    rows = score_deciles(ds, "n_chars", n_tiles=10).take_all()
    n = t.num_rows
    q, r = divmod(n, 10)
    sizes = {}
    for row in rows:
        sizes[row["tile"]] = sizes.get(row["tile"], 0) + 1
    assert sizes == {i + 1: (q + 1 if i < r else q) for i in range(10)}
    # rank within tile is consistent: tile of rank recomputed
    for row in rows:
        assert row["tile"] == ntile_of_rank(
            np.array([row["rank"]]), n, 10
        )[0]


def test_rrf_fusion_hand_case(ray_session):
    import ray.data as rd

    from textalyzer_ray.pipelines.rank import rrf_fusion

    ra = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "rank": pa.array([0, 1, 2], pa.int64())})
    )
    rb = rd.from_arrow(
        pa.table({"doc_id": pa.array([3, 4], pa.int64()),
                  "rank": pa.array([0, 1], pa.int64())})
    )
    rows = rrf_fusion([ra, rb], depth=2, k=60, topn=10).take_all()
    # depth=2 drops doc 3 from list a (rank 2); contributions:
    # doc1: 1/61, doc2: 1/62, doc3: 1/61 (list b), doc4: 1/62
    got = [(r["doc_id"], r["rrf"], r["n_lists"]) for r in rows]
    assert got == [
        (1, 1.0 / 61, 1),
        (3, 1.0 / 61, 1),
        (2, 1.0 / 62, 1),
        (4, 1.0 / 62, 1),
    ]


def test_source_outliers_planted(ray_session):
    import ray.data as rd

    from textalyzer_ray.pipelines.analytics import source_outliers

    # group A: 9 values at 100 +/- small, one wild value 10_000
    vals_a = [98, 99, 100, 100, 100, 101, 101, 102, 103, 10_000]
    # group B: constant -> mad 0, any deviation is an outlier
    vals_b = [50, 50, 50, 50, 51]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(vals_a) + len(vals_b)), pa.int64()),
            "source": pa.array(["a"] * len(vals_a) + ["b"] * len(vals_b)),
            "n_chars": pa.array(vals_a + vals_b, pa.int64()),
        }
    )
    rows = source_outliers(rd.from_arrow(t).repartition(3)).take_all()
    by_id = {r["doc_id"]: r for r in rows}
    assert len(rows) == t.num_rows
    # group a: lower median of 10 values = sorted[4] = 100
    assert by_id[0]["med"] == 100
    flagged_a = [r["doc_id"] for r in rows if r["source"] == "a" and r["is_outlier"]]
    assert flagged_a == [9]
    # group b: med 50, mad 0 -> the single 51 is flagged
    flagged_b = [r["doc_id"] for r in rows if r["source"] == "b" and r["is_outlier"]]
    assert flagged_b == [14]


def test_crawl_schedule_invariants(ray_session):
    import ray.data as rd

    from textalyzer_ray.pipelines.robots import (
        crawl_schedule,
        frontier_robots_filter,
        robots_rules_for_sites,
    )

    urls = [
        f"https://site{h}.example/page/{i}"
        for h in (0, 1, 2, 3, 12)
        for i in (5, 7, 12, 100, 121, 1234)
    ]
    cand = rd.from_arrow(
        pa.table({"url": pa.array(urls * 2)})  # dups must collapse
    ).repartition(4)
    rules = robots_rules_for_sites(50)
    rows = crawl_schedule(cand, rules).take_all()
    # 1) only allowed URLs are scheduled, each exactly once
    verdicts = {
        r["url"]: r["allowed"]
        for r in frontier_robots_filter(
            rd.from_arrow(pa.table({"url": pa.array(urls)})), rules
        ).take_all()
    }
    allowed = {u for u, a in verdicts.items() if a == 1}
    assert {r["url"] for r in rows} == allowed
    assert len(rows) == len(allowed)
    # 2) per-host ranks are contiguous 0..k-1 in url order; wave math
    by_host = {}
    for r in sorted(rows, key=lambda r: r["url"]):
        by_host.setdefault(r["host"], []).append(r)
    for host, hr in by_host.items():
        h = int(host.removeprefix("site").split(".")[0])
        delay = 1 + h % 3
        assert [r["host_rank"] for r in hr] == list(range(len(hr)))
        for r in hr:
            assert r["crawl_delay"] == delay
            assert r["fetch_wave"] == r["host_rank"] * delay
