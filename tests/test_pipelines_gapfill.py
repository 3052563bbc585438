"""Dense resample + rolling window (events_gapfill_rolling):
brute-force equivalence incl. gap buckets, roll_w variants, empties."""

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.pipelines.analytics import events_gapfill_rolling

pytestmark = pytest.mark.usefixtures("quiet_data_context")


def brute(ts_us, window_s, roll_w):
    win = window_s * 1_000_000
    buckets = [t // win for t in ts_us]
    if not buckets:
        return []
    lo, hi = min(buckets), max(buckets)
    dense = {b: 0 for b in range(lo, hi + 1)}
    for b in buckets:
        dense[b] += 1
    out = []
    for b in range(lo, hi + 1):
        roll = sum(dense.get(b - j, 0) for j in range(roll_w) if b - j >= lo)
        out.append({"hr": b, "n_events": dense[b], "rolling_n": roll})
    return out


def run(ts_us, window_s, roll_w):
    t = pa.table({"ts": pa.array(ts_us, pa.timestamp("us"))})
    return events_gapfill_rolling(
        rd.from_arrow(t).repartition(3), window_s, roll_w
    ).take_all()


class TestGapfillRolling:
    @pytest.mark.parametrize("roll_w", [1, 3, 5])
    def test_matches_brute_with_gaps(self, roll_w):
        # buckets 0,0,2,5,5,5,9 at window_s=10 -> gaps at 1,3,4,6,7,8
        ts = [1, 5, 25, 52, 55, 58, 95]
        ts_us = [t * 1_000_000 for t in ts]
        assert run(ts_us, 10, roll_w) == brute(ts_us, 10, roll_w)

    def test_small_equals_distributed(self):
        ts_us = [t * 777_000 for t in range(0, 900, 7)]
        t = pa.table({"ts": pa.array(ts_us, pa.timestamp("us"))})
        a = events_gapfill_rolling(rd.from_arrow(t), 10, 3).take_all()
        b = events_gapfill_rolling(
            rd.from_arrow(t), 10, 3, small_threshold=0
        ).take_all()
        assert a == b and len(a) > 0

    def test_single_bucket(self):
        ts_us = [3_000_000, 4_000_000]
        assert run(ts_us, 10, 3) == [
            {"hr": 0, "n_events": 2, "rolling_n": 2}
        ]

    def test_empty_events(self):
        assert run([], 10, 3) == []

    def test_sf0001_matches_duckdb(self):
        import duckdb

        src = "/root/testdata/sf0.001/events.parquet"
        got = events_gapfill_rolling(
            rd.read_parquet(src), window_s=600, roll_w=3
        ).take_all()
        exp = duckdb.sql(
            "WITH b AS (SELECT epoch_us(ts) // 600000000 AS hr, count(*) n "
            f"FROM read_parquet('{src}') GROUP BY 1), "
            "g AS (SELECT unnest(generate_series((SELECT min(hr) FROM b), "
            "(SELECT max(hr) FROM b))) AS hr), "
            "d AS (SELECT g.hr AS hr, coalesce(b.n, 0) AS n_events "
            "FROM g LEFT JOIN b ON b.hr = g.hr) "
            "SELECT hr, CAST(n_events AS BIGINT) n_events, "
            "CAST(sum(n_events) OVER (ORDER BY hr ROWS BETWEEN 2 PRECEDING "
            "AND CURRENT ROW) AS BIGINT) rolling_n FROM d ORDER BY hr"
        ).df()
        assert len(got) == len(exp)
        # real gaps must exist at this sf or the fill path isn't tested
        assert sum(1 for r in got if r["n_events"] == 0) > 100
        for r, (_, e) in zip(got, exp.iterrows()):
            assert r["hr"] == e["hr"] and r["n_events"] == e["n_events"]
            assert r["rolling_n"] == e["rolling_n"]
