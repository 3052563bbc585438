"""Streaming band join: equality with the brute-force band join over
hand-built waves, bounded-state eviction evidence, wave invariance."""

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.state.stream_join import StreamBandJoin, stream_range_join

pytestmark = pytest.mark.usefixtures("quiet_data_context")

M = 60_000_000  # one minute in us


def events(rows):
    """rows: (event_id, minute, user, type)."""
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] * M for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
    )


def brute(rows, lower_min=60, upper_min=0):
    out = []
    for li, lm, lu, lt in rows:
        if lt != "purchase":
            continue
        for ri, rm, ru, rt in rows:
            if rt == "view" and ru == lu and lm - lower_min <= rm <= lm + upper_min:
                out.append({"event_id": li, "event_id_right": ri})
    return sorted(out, key=lambda r: (r["event_id"], r["event_id_right"]))


ROWS = [
    (0, 0, 1, "view"),
    (1, 10, 1, "view"),
    (2, 30, 1, "purchase"),   # pairs 0, 1
    (3, 45, 2, "view"),
    (4, 80, 1, "purchase"),   # pairs 1 (t=10 < 80-60? 10<20 -> no), so pairs: none of 0; 1 is 10 -> 80-60=20 > 10 -> no
    (5, 90, 2, "purchase"),   # pairs 3 (45 >= 30)
    (6, 100, 2, "view"),
    (7, 130, 2, "purchase"),  # pairs 6 (100 >= 70); 3 is 45 < 70 -> no
    (8, 200, 3, "view"),
]


class TestStreamBandJoin:
    def test_matches_brute_force_across_wave_counts(self):
        want = brute(ROWS)
        assert want  # non-trivial
        for waves in (1, 2, 4, 9):
            got = stream_range_join(
                events(ROWS), n_waves=waves, n_shards=2
            ).take_all()
            assert got == want, f"waves={waves}"

    def test_state_evicts_below_watermark(self):
        jn = StreamBandJoin(lower_s=3600, upper_s=0, n_shards=1)
        try:
            p1 = jn.process_wave(
                events(ROWS[:4]), "purchase", "view"
            ).take_all()
            assert len(p1) == 2  # purchase 2 x views 0, 1
            st = jn.advance_watermark(45 * M)
            # view 0 (t=0): 0 + 60min < 45min? no (60 >= 45) -> kept;
            # purchase rows evict once ts < wm (upper=0)
            assert st["state_left"] == 0  # purchase 2 (t=30) < wm=45
            p2 = jn.process_wave(
                events(ROWS[4:]), "purchase", "view"
            ).take_all()
            got = sorted(
                p1 + p2, key=lambda r: (r["event_id"], r["event_id_right"])
            )
            assert got == brute(ROWS)
            st2 = jn.advance_watermark(200 * M)
            # only view 8 (t=200) and view 6 (t=100: 100+60 < 200 -> out)
            assert st2["state_right"] == 1
        finally:
            jn.shutdown()

    def test_empty_stream(self):
        got = stream_range_join(events([]), n_waves=3).take_all()
        assert got == []
