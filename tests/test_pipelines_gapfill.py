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


def test_cusum_alarms_hand_case(ray_session):
    """W=4 dense windows, three types: 'a' bursts then fades
    (S=[8,16,8,0], alarm only at S=16>12), 'b' is flat (S=0 — CUSUM's
    whole point: steady rate never alarms), 'c' has gap windows that
    must count as zeros (S=[16,4,0,8], alarm at 16)."""
    import pyarrow as pa
    import ray.data as rd

    from textalyzer_ray.pipelines.analytics import cusum_alarms

    rows = []
    for w, c in ((0, 5), (1, 5), (2, 1), (3, 1)):
        rows += [(w * 60 + 1, "a")] * c
    for w in range(4):
        rows += [(w * 60 + 2, "b")] * 3
    for w, c in ((0, 7), (3, 5)):
        rows += [(w * 60 + 3, "c")] * c
    ev = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array(
                    [t * 1_000_000 for t, _ in rows], pa.timestamp("us")
                ),
                "event_type": pa.array([ty for _, ty in rows], pa.string()),
            }
        )
    ).repartition(3)

    out = cusum_alarms(ev, window_s=60, h_mult=1).take_all()
    assert [
        (r["event_type"], r["window_start"], r["n"], r["cusum"]) for r in out
    ] == [("a", 60, 5, 16), ("c", 0, 7, 16)]


def test_theil_sen_hand_case(ray_session):
    """'lin' rises 2/window with one huge outlier window that the
    median ignores (slopes sorted [2,2,2,33.3,49,96] -> lower median
    2.0); 'gap' has missing windows that must count as zero on the
    GLOBAL grid (dense [3,0,3,0] over the 4-window span -> slopes
    [-3,-3,-1,0,0,3] -> lower median -1.0)."""
    import pyarrow as pa
    import ray.data as rd

    from textalyzer_ray.pipelines.analytics import theil_sen_trends

    rows = []
    for w, c in ((0, 0), (1, 2), (2, 4), (3, 100)):
        rows += [(w * 60 + 1, "lin")] * c
    for w, c in ((0, 3), (2, 3)):
        rows += [(w * 60 + 2, "gap")] * c
    ev = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array(
                    [t * 1_000_000 for t, _ in rows], pa.timestamp("us")
                ),
                "event_type": pa.array([ty for _, ty in rows], pa.string()),
            }
        )
    ).repartition(3)

    out = theil_sen_trends(ev, window_s=60).take_all()
    got = {r["event_type"]: r for r in out}
    assert set(got) == {"lin", "gap"}
    assert got["lin"]["n_windows"] == 4 and got["lin"]["n_pairs"] == 6
    assert got["lin"]["slope"] == 2.0
    assert got["gap"]["n_windows"] == 4
    assert got["gap"]["slope"] == -1.0


def test_ols_trends_hand_case(ray_session):
    """'lin' is exactly linear y = 2x + 1 over 4 windows (slope 2,
    intercept 1 recovered exactly by the integer closed form); 'gap'
    has zero-count windows on the GLOBAL grid (dense [3,0,3,0] ->
    Sy=6, Sxy=6 -> slope (4*6 - 6*6)/(4*14 - 36) = -12/20 = -0.6,
    intercept (6*14 - 6*6)/20 = 48/20 = 2.4)."""
    import pyarrow as pa
    import ray.data as rd

    from textalyzer_ray.pipelines.analytics import ols_trends

    rows = []
    for w, c in ((0, 1), (1, 3), (2, 5), (3, 7)):
        rows += [(w * 60 + 1, "lin")] * c
    for w, c in ((0, 3), (2, 3)):
        rows += [(w * 60 + 2, "gap")] * c
    ev = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array(
                    [t * 1_000_000 for t, _ in rows], pa.timestamp("us")
                ),
                "event_type": pa.array([ty for _, ty in rows], pa.string()),
            }
        )
    ).repartition(3)

    out = ols_trends(ev, window_s=60).take_all()
    got = {r["event_type"]: r for r in out}
    assert set(got) == {"lin", "gap"}
    assert got["lin"]["n_windows"] == 4
    assert got["lin"]["slope"] == 2.0
    assert got["lin"]["intercept"] == 1.0
    assert got["gap"]["slope"] == -0.6
    assert got["gap"]["intercept"] == 2.4


def test_ols_trends_single_window_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from textalyzer_ray.pipelines.analytics import ols_trends

    ev = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array([1_000_000, 2_000_000], pa.timestamp("us")),
                "event_type": pa.array(["a", "b"], pa.string()),
            }
        )
    )
    assert ols_trends(ev, window_s=60).take_all() == []
