"""Streaming windows: hand-built waves with known late events,
watermark advance, partitioning invariance, empty waves."""

import pyarrow as pa
import pytest
import ray.data as rd

from textalyzer_ray.state.stream_window import StreamWindowAgg, stream_windows

pytestmark = pytest.mark.usefixtures("quiet_data_context")


def events(rows):
    """rows: (event_id, us, type) with ts in raw microseconds."""
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


H = 3_600_000_000  # 1h in us


class TestStreamWindowAgg:
    def test_late_drop_and_on_time(self):
        agg = StreamWindowAgg(window_s=3600, allowed_lateness_s=1800, n_shards=2)
        try:
            # wave 1: events up to t=3h -> watermark = 3h - 30min
            s1 = agg.process_wave(
                events([(0, 0, "a"), (1, H + 1, "a"), (2, 3 * H, "b")])
            )
            assert s1["watermark_us"] == 3 * H - H // 2
            assert s1["late"] == 0
            # wave 2: window 0 ended at 1h <= wm -> late;
            # window 2 ends at 3h > wm -> on time
            s2 = agg.process_wave(
                events([(3, 5, "a"), (4, 2 * H + 5, "b")])
            )
            assert s2["late"] == 1 and s2["on_time"] == 4
            got = agg.result().take_all()
            assert got == [
                {"window_id": -1, "event_type": "a", "n": 1},
                {"window_id": 0, "event_type": "a", "n": 1},
                {"window_id": 1, "event_type": "a", "n": 1},
                {"window_id": 2, "event_type": "b", "n": 1},
                {"window_id": 3, "event_type": "b", "n": 1},
            ]
        finally:
            agg.shutdown()

    def test_watermark_never_regresses(self):
        agg = StreamWindowAgg(window_s=3600, allowed_lateness_s=0, n_shards=1)
        try:
            s1 = agg.process_wave(events([(0, 10 * H, "a")]))
            s2 = agg.process_wave(events([(1, 2 * H, "a")]))  # older wave
            assert s2["watermark_us"] == s1["watermark_us"] == 10 * H
            assert s2["late"] == 1  # 2h window long closed
        finally:
            agg.shutdown()

    def test_empty_wave_keeps_state(self):
        agg = StreamWindowAgg(n_shards=1)
        try:
            agg.process_wave(events([(0, H, "a")]))
            s = agg.process_wave(events([]))
            assert s["on_time"] == 1 and s["late"] == 0
            assert len(agg.result().take_all()) == 1
        finally:
            agg.shutdown()

    def test_gate_composition_partitioning_invariant(self):
        rows = [(i, (i * 37 % 50) * H // 3, "t" + str(i % 2)) for i in range(200)]
        a = stream_windows(events(rows), n_waves=3).take_all()
        b = stream_windows(events(rows).repartition(7), n_waves=3).take_all()
        assert a == b
        assert sum(r["n"] for r in a) == 200  # nothing lost, late included
